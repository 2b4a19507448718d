"""The ``distribute`` sliding-window aggregator.

From-scratch Spark re-expression of ``EventsRelation.distribute``
(``/root/reference/linref/events/relate.py:1295-1521``) and the decay
functions (``relate.py:2281-2387``). Semantics (axis=1):

1. every (target row q, source j) match weight w is *spread* to target rows
   q-s (forward) / q+s (backward), s = 0..decay_size, scaled by decay(s) —
   neighbors are **positional** (rows in the target frame's original order,
   here ``event_id``), not measure-distance;
2. contributions crossing group boundaries are zeroed
   (``relate.py:1480-1495``);
3. optional multiply by target event length (favor longer events,
   ``relate.py:1497-1499``);
4. normalize so each source's shares sum to 1.0 (``relate.py:1501-1512``);
5. multiply by the source's data value and sum per target
   (``relate.py:1514-1520``); untouched targets get 0.

Decay weights (``relate.py:2333-2387``), with decay(0) = 1 always and
decay_size = 0 short-circuiting to weight 1:

- linear       1 - s/(size+1)
- exponential  exp(-5 * s/(size+1))
- gaussian     exp(-(3 s / size)^2 / 2)   (normal pdf ratio)
- flat         1

Spark-first: the reference's padded-matrix row shifts become an ``explode``
over a tiny (offset, decay-weight) array literal followed by an equi-join on
target position — one narrow join + one window + one groupBy. The offset
table is O(decay_size), driver-side, broadcast implicitly.

Scale note: positions are the target frame's dense 0-based ``event_id``
(linref's row index), minted by the DISTRIBUTED ordinal in
:func:`linref_spark.events.frame.global_ordinal_id` — no single-task sort
anywhere in the position pipeline. The group mask means only same-route
neighbors contribute, and canonical order keeps each route's rows
contiguous, so the positional window semantics match linref exactly.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linref_spark.lrs import EVENT_ID, LRS
from linref_spark.relate.join import LEFT_ID, RIGHT_ID, WEIGHT

DecayFn = Callable[[int], float]


def make_decay(decay_func: Union[str, DecayFn], decay_size: int) -> DecayFn:
    if decay_size < 0:
        raise ValueError("decay_size must be non-negative")

    def wrap(f: Callable[[int], float]) -> DecayFn:
        def g(s: int) -> float:
            if decay_size == 0 or s == 0:
                return 1.0
            return f(s)
        return g

    if callable(decay_func):
        return wrap(decay_func)
    name = decay_func if decay_func is not None else "flat"
    cap = decay_size + 1.0
    if name in ("linear", "lin"):
        return wrap(lambda s: 1.0 - s / cap)
    if name in ("exponential", "exp"):
        return wrap(lambda s: math.exp(-5.0 * s / cap))
    if name in ("gaussian", "gauss"):
        return wrap(lambda s: math.exp(-((3.0 * s / decay_size) ** 2) / 2.0))
    if name in ("flat", "none"):
        return wrap(lambda s: 1.0)
    raise ValueError(
        "decay_func must be 'linear', 'exponential', 'gaussian', 'flat', "
        "or a callable"
    )


def distribute(
    pairs: DataFrame,
    target: DataFrame,
    source: DataFrame,
    target_lrs: LRS,
    source_lrs: LRS,
    value_col: Optional[str] = None,
    axis: int = 1,
    decay_size: int = 0,
    decay_func: Union[str, DecayFn] = "linear",
    direction: str = "both",
    length_normalize: bool = True,
    out_col: str = "distributed",
) -> DataFrame:
    """Append ``out_col`` (double) to ``target``; see module docstring.

    ``pairs`` is an intersect or overlay pair table (weight column optional;
    defaults to 1.0 per match, i.e. intersect counts). ``value_col`` of None
    distributes raw shares (data = ones).
    """
    if direction not in ("both", "forward", "forw", "backward", "back"):
        raise ValueError("direction must be 'both', 'forward', or 'backward'")
    decay = make_decay(decay_func, decay_size)
    if decay(0) != 1.0:
        raise ValueError("Decay function must return 1.0 for step 0.")

    if axis == 1:
        tgt_id, src_id = LEFT_ID, RIGHT_ID
    elif axis == 0:
        tgt_id, src_id = RIGHT_ID, LEFT_ID
    else:
        raise ValueError("axis must be 0 or 1")
    w = F.col(WEIGHT) if WEIGHT in pairs.columns else F.lit(1.0)

    # offset table: contribution of a match at target position q lands at
    # q + d with scale dw (forward spread = earlier rows, relate.py:1470-1476)
    offsets = [(0, 1.0)]
    for s in range(1, decay_size + 1):
        dw = decay(s)
        if direction in ("forward", "forw", "both"):
            offsets.append((-s, dw))
        if direction in ("backward", "back", "both"):
            offsets.append((s, dw))
    off_arr = F.array(
        *[
            F.struct(F.lit(d).alias("d"), F.lit(dw).alias("dw"))
            for d, dw in offsets
        ]
    )

    contrib = (
        pairs.select(
            F.col(tgt_id).alias("_q"), F.col(src_id).alias("_j"), w.alias("_w")
        )
        .withColumn("_off", F.explode(off_arr))
        .select(
            (F.col("_q") + F.col("_off.d")).alias("_r"),
            "_j",
            (F.col("_w") * F.col("_off.dw")).alias("_c"),
        )
    )

    # join target rows: position existence + group + length
    tnarrow_cols = [F.col(EVENT_ID).alias("_r2")]
    for i, k in enumerate(target_lrs.key_cols):
        tnarrow_cols.append(F.col(k).alias(f"_tg{i}"))
    if length_normalize:
        if not target_lrs.is_linear:
            raise ValueError("length_normalize requires linear target events")
        tnarrow_cols.append(
            (F.col(target_lrs.end_col) - F.col(target_lrs.beg_col)).alias("_len")
        )
    tnarrow = target.select(*tnarrow_cols)
    contrib = contrib.join(tnarrow, on=F.col("_r") == F.col("_r2"), how="inner")

    # group mask against the source event's group (relate.py:1480-1495)
    if target_lrs.is_grouped:
        snarrow = source.select(
            F.col(EVENT_ID).alias("_j2"),
            *[
                F.col(k).alias(f"_sg{i}")
                for i, k in enumerate(source_lrs.key_cols)
            ],
        )
        contrib = contrib.join(snarrow, on=F.col("_j") == F.col("_j2"), how="inner")
        same = F.lit(True)
        for i in range(len(target_lrs.key_cols)):
            same = same & (F.col(f"_tg{i}") == F.col(f"_sg{i}"))
        contrib = contrib.where(same)

    if length_normalize:
        contrib = contrib.withColumn("_c", F.col("_c") * F.col("_len"))

    # normalize each source's shares to sum 1 (relate.py:1501-1512)
    tot = F.sum("_c").over(Window.partitionBy("_j"))
    contrib = contrib.withColumn(
        "_c", F.when(tot != 0.0, F.col("_c") / tot).otherwise(F.col("_c"))
    )

    # multiply by data and reduce per target (relate.py:1514-1520)
    if value_col is not None:
        vals = source.select(
            F.col(EVENT_ID).alias("_j3"), F.col(value_col).cast("double").alias("_v")
        )
        contrib = contrib.join(vals, on=F.col("_j") == F.col("_j3"), how="inner")
        contrib = contrib.withColumn("_c", F.col("_c") * F.col("_v"))

    agg = contrib.groupBy("_r").agg(F.sum("_c").alias(out_col))
    out = target.join(agg, on=F.col(EVENT_ID) == F.col("_r"), how="left").drop("_r")
    return out.fillna({out_col: 0.0})
