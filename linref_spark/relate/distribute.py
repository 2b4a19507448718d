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

Spark-first, in the SEPARATED form. The naive plan explodes every match
over the (2*decay_size+1) offsets and normalizes with a window over that
exploded table — O(K*P) rows through the heaviest shuffle (P = matches,
K = offsets). But the spread is separable: a match at target position q
contributes ``w * dw(d) * len(q+d) * [same group]`` to position q+d, so a
source's normalization total is ``tot_j = sum_q w * S(q)`` where

    S(q) = sum_d dw(d) * len(q+d) * [group(q+d) == group(q)]

depends on q ALONE (every match shares the target's group by the join
construction). The plan therefore runs:

1. ``S(q)``: positional lead/lag window over the TARGET rows (grouped:
   partitioned by route; ungrouped: partitioned by dense-ordinal buckets
   with decay_size halo replication — no SinglePartition);
2. ``tot_j``: join matches to S(q) on position, groupBy source — O(P)
   with map-side combine (see the in-function note for why this is NOT
   a window over the joined table: windows cannot skew-split a hot
   source);
3. ``A(q) = sum_j w * v_j / tot_j`` per match position — O(P);
4. spread: the same positional window over A, scaled by len(r).

The O(K*P) exploded table and its window never exist; the heavy stages
touch P rows twice and T rows twice (T << P whenever matches fan out).
Measured 3-4x on the sf1-proxy bench (BENCH/BASELINE.md round 3). The
zero-total fallback (divide only when tot != 0) is preserved exactly:
weights/lengths are non-negative for built-in decays, and for custom
decays a zero total implies every contribution is itself zero.

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


def _assert_pos_contiguous(tnarrow: DataFrame, n_keys: int):
    """Raise unless _pos is contiguous (per group when grouped, globally
    otherwise). Returns (min_pos, row_count) for the ungrouped case so
    the caller can size window buckets without a second job."""
    gcols = [F.col(f"_tg{i}") for i in range(n_keys)]
    stats = tnarrow.groupBy(*gcols).agg(
        F.min("_pos").alias("_mn"),
        F.max("_pos").alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
        # NOTE: span==count alone passes when a duplicate id exactly
        # cancels a gap (e.g. [0,1,1,3]). That hole is closed by the
        # in-plan adjacent-duplicate assert inside the positional window
        # (see distribute() below), which costs ZERO extra jobs — a
        # countDistinct here would add a full extra exchange per call
        # (measured +0.36 s at sf0.1; the distinct rewrite is two-phase).
    )
    if n_keys:
        bad = stats.where(
            F.col("_mx") - F.col("_mn") + F.lit(1) != F.col("_n")
        ).first()
        if bad is not None:
            raise ValueError(
                "distribute: target event ids are not contiguous within "
                "group "
                + str(tuple(bad[i] for i in range(n_keys)))
                + f" (ids span [{bad['_mn']}, {bad['_mx']}] over "
                f"{bad['_n']} rows). distribute's positional neighbor "
                "semantics need a dense canonical id — re-mint with "
                "linref_spark.events.frame.add_event_id after any filter."
            )
        return None
    row = stats.first()
    if row is None or row["_n"] == 0:
        return (0, 0)
    if row["_mx"] - row["_mn"] + 1 != row["_n"]:
        raise ValueError(
            "distribute: target event ids are not contiguous (ids span "
            f"[{row['_mn']}, {row['_mx']}] over {row['_n']} rows). "
            "distribute's positional neighbor semantics need a dense "
            "canonical id — re-mint with "
            "linref_spark.events.frame.add_event_id after any filter."
        )
    return (row["_mn"], row["_n"])


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
    if length_normalize and not target_lrs.is_linear:
        raise ValueError("length_normalize requires linear target events")

    # narrow target positions: id, group cols, spread weight (length or 1)
    tnarrow_cols = [F.col(EVENT_ID).alias("_pos")]
    for i, k in enumerate(target_lrs.key_cols):
        tnarrow_cols.append(F.col(k).alias(f"_tg{i}"))
    if length_normalize:
        tnarrow_cols.append(
            (F.col(target_lrs.end_col) - F.col(target_lrs.beg_col)).alias("_len")
        )
    else:
        tnarrow_cols.append(F.lit(1.0).alias("_len"))
    tnarrow = target.select(*tnarrow_cols)

    n_keys = len(target_lrs.key_cols)

    # The positional semantics require _pos (the target's event_id) to be
    # CONTIGUOUS — per group for grouped frames, globally for ungrouped:
    # lead/lag moves by ROWS, so a gap (e.g. a frame filtered after
    # add_event_id) would silently shift "position q+d" off "d rows
    # ahead". The reference resets positional indices before distributing
    # (relate.py:1295-1521 operates on a reset index), so non-dense ids
    # are a caller error here, checked cheaply (one tiny agg job) instead
    # of documented-only.
    pos_stats = _assert_pos_contiguous(tnarrow, n_keys)

    # Both spread stages run as WINDOW forms: "position q+d" is "d rows
    # ahead" inside a positional window ordered by _pos — lead/lag
    # expressions (pure whole-stage codegen, one exchange) replace the
    # explode(K*T) + position join + groupBy round-trips.
    #
    # - Grouped frames partition the window by the route keys; the
    #   partition boundary IS the reference's group mask
    #   (relate.py:1480-1495: cross-group contributions zero).
    # - Ungrouped frames partition by measure-axis BUCKETS of the dense
    #   ordinal, replicating each row into the neighbor bucket when it
    #   sits within decay_size of a bucket edge (halo rows). Owned rows
    #   see every neighbor they need inside their bucket; halo replicas
    #   are filtered from the output. Same 1-exchange plan, no
    #   SinglePartition — the old join form's extra explode+join+groupBy
    #   round-trip per stage is gone.
    from functools import reduce
    from operator import add

    if n_keys:
        wspec = Window.partitionBy(
            *[F.col(f"_tg{i}") for i in range(n_keys)]
        ).orderBy(F.col("_pos"))
    else:
        n_rows = pos_stats[1]
        spark = target.sparkSession
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        bucket = max(
            2 * decay_size + 1,
            -(-n_rows // max(parts * 4, 1)),  # ceil div: ~4 buckets/task
            64,
        )
        wspec = Window.partitionBy(F.col("_bkt")).orderBy(F.col("_pos"))

    def shifted(col, d):
        if d == 0:
            return col
        moved = (
            F.lead(col, d).over(wspec) if d > 0
            else F.lag(col, -d).over(wspec)
        )
        return F.coalesce(moved, F.lit(0.0))

    def windowed(df: DataFrame, expr_alias, guard_dups: bool = False) -> DataFrame:
        """(_pos, expr) per OWNED row, where expr combines `shifted`
        columns of ``df``. Handles the halo replication for the bucketed
        ungrouped window.

        ``guard_dups`` adds an in-plan adjacent-duplicate assert computed
        in the SAME window pass (same partitioning and order, so WindowExec
        evaluates it alongside the lead/lag frame — zero extra exchange or
        job): the eager span==count precondition check passes when a
        duplicate id exactly cancels a gap ([0,1,1,3]), which would
        silently misalign lead/lag rows; duplicates are adjacent in this
        window's order, so one lag comparison catches them and assert_true
        raises at execution instead. assert_true is NULL on success, so
        the guard filter keeps every valid row.
        """
        alias, build = expr_alias

        def dup_guard(frame: DataFrame) -> DataFrame:
            if not guard_dups:
                return frame.drop("_dupchk") if "_dupchk" in frame.columns else frame
            return frame.where(
                F.assert_true(
                    F.col("_dupchk"),
                    F.lit(
                        "distribute: duplicate target event ids detected — "
                        "positional neighbor semantics need DISTINCT dense "
                        "ids; re-mint with "
                        "linref_spark.events.frame.add_event_id"
                    ),
                ).isNull()
            ).drop("_dupchk")

        dup_col = (
            F.coalesce(F.lag(F.col("_pos")).over(wspec) != F.col("_pos"), F.lit(True))
            if guard_dups
            else F.lit(True)
        )
        if n_keys:
            return dup_guard(
                df.select(
                    F.col("_pos"),
                    build(shifted).alias(alias),
                    dup_col.alias("_dupchk"),
                )
            )
        d = F.lit(decay_size)
        b = F.lit(bucket)
        halo = F.array_distinct(
            F.array(
                F.floor(F.col("_pos") / b),
                F.floor((F.col("_pos") - d) / b),
                F.floor((F.col("_pos") + d) / b),
            )
        )
        e = df.withColumn("_bkt", F.explode(halo))
        out = e.select(
            F.col("_pos"), F.col("_bkt"), build(shifted).alias(alias),
            dup_col.alias("_dupchk"),
        )
        out = out.where(F.floor(F.col("_pos") / b) == F.col("_bkt")).drop(
            "_bkt"
        )
        return dup_guard(out)

    # S(q) = sum_d dw(d) * len(q + d) within the group / frame
    # (guard_dups: one lag comparison inside this already-paid window
    # pass rejects duplicate ids — see the windowed() docstring)
    s_q = windowed(
        tnarrow,
        (
            "_S",
            lambda sh: reduce(
                add, [sh(F.col("_len"), d) * F.lit(dw) for d, dw in offsets]
            ),
        ),
        guard_dups=True,
    ).withColumnRenamed("_pos", "_q")

    p = pairs.select(
        F.col(tgt_id).alias("_q"), F.col(src_id).alias("_j"), w.alias("_w")
    )

    # per-source totals: tot_j = sum over matches of w * S(q)
    # (relate.py:1501-1512). S(q) sums dw*len over the positions the match
    # would spread to — identical to summing the exploded contributions.
    #
    # DELIBERATELY a groupBy + rejoin, not a Window.partitionBy(_j) sum
    # over the joined table: the window form would run the pairs subtree
    # once instead of twice, but it funnels EVERY match row of a hot
    # source into a single window partition with no map-side combine and
    # no AQE skew splitting (skew handling applies to joins and
    # aggregations, not windows) — a one-task straggler at the 10^12-row
    # target the moment one source matches a large fraction of a route.
    # The groupBy partial-aggregates map-side (tot is <= one row per
    # source before the shuffle) and the rejoin is AQE-broadcastable /
    # skew-splittable; the duplicated pairs subtree is the lesser cost,
    # and dedupes to a ReusedExchange whenever the caller's pair table is
    # itself a shuffle output. (A/B at sf0.1: the two forms are within
    # noise locally — 2.4-2.7 s vs 2.5-2.8 s isolated.)
    tot = (
        p.join(s_q, on="_q")
        .groupBy("_j")
        .agg(F.sum(F.col("_w") * F.col("_S")).alias("_tot"))
    )
    pj = p.join(tot, on="_j")

    # per-position normalized source mass: A(q) = sum_j w * v_j / tot_j
    # (tot == 0 implies every contribution is zero — dividing by 1 keeps
    # the reference's leave-unnormalized fallback exactly)
    if value_col is not None:
        vals = source.select(
            F.col(EVENT_ID).alias("_j3"), F.col(value_col).cast("double").alias("_v")
        )
        pj = pj.join(vals, on=F.col("_j") == F.col("_j3"), how="inner")
        mass = F.col("_w") * F.col("_v")
    else:
        mass = F.col("_w")
    safe_tot = F.when(F.col("_tot") != 0.0, F.col("_tot")).otherwise(F.lit(1.0))
    a_q = pj.groupBy("_q").agg(F.sum(mass / safe_tot).alias("_A"))

    # spread A(q) over the offsets and scale by len(r) (relate.py:1514-1520);
    # destination r receives from origin q = r - d for each offset d
    a_full = tnarrow.join(
        a_q.withColumnRenamed("_q", "_pos"), on="_pos", how="left"
    ).withColumn("_A", F.coalesce(F.col("_A"), F.lit(0.0)))
    agg = windowed(
        a_full,
        (
            out_col,
            lambda sh: F.col("_len")
            * reduce(
                add, [sh(F.col("_A"), -d) * F.lit(dw) for d, dw in offsets]
            ),
        ),
    ).withColumnRenamed("_pos", "_r")
    out = target.join(agg, on=F.col(EVENT_ID) == F.col("_r"), how="left").drop("_r")
    return out.fillna({out_col: 0.0})
