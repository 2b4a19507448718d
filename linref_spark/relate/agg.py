"""Relation aggregators: fold the pair table onto one side's event index.

From-scratch Spark re-expressions of ``EventsRelation``'s matrix-vector
aggregators (``/root/reference/linref/events/relate.py``). The reference
multiplies a sparse m-by-n matrix by a value vector; here every aggregator is
a ``groupBy(target_id)`` (map-side partial agg + one shuffle) or a window over
the pair table, followed by a join back onto the target frame:

- count        (``relate.py:729-754``)   matrix row/col sums        -> groupBy count
- sum          (``relate.py:1023-1099``) sum(w*v), conserve option  -> groupBy sum
- mean         (``relate.py:1105-1169``) sum(w*v)/sum(w), NaN empty -> groupBy + null-safe divide
- mode         (``relate.py:1175-1290``) argmax of per-value weight -> groupBy + row_number
- first/last/single (``relate.py:760-878``) k-th partner in source row order -> row_number window
- list/set     (``relate.py:884-967``)   per-target value arrays    -> sort_array(collect_list)
- value_counts (``relate.py:972-1018``)  wide per-value counts      -> pivot

``axis`` follows the reference (``relate.py:735-738``): axis=1 aggregates
right events onto the left index; axis=0 the reverse.

Scale notes: every aggregation here is a single hash-partitioned shuffle on
the target id with map-side combine; ordering aggregators use windows
partitioned by target id, never global sorts. The join back to the target
frame is id-equi and AQE-broadcastable when the aggregate side is small.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from linref_spark.lrs import EVENT_ID
from linref_spark.relate.join import LEFT_ID, RIGHT_ID, WEIGHT


def _tgt_src(axis: int) -> tuple[str, str]:
    if axis == 1:
        return LEFT_ID, RIGHT_ID
    if axis == 0:
        return RIGHT_ID, LEFT_ID
    raise ValueError("axis must be 0 or 1")


def _weight(pairs: DataFrame) -> Column:
    return F.col(WEIGHT) if WEIGHT in pairs.columns else F.lit(1.0)


def _join_back(target: DataFrame, agg: DataFrame, tgt_id: str) -> DataFrame:
    return target.join(
        agg, on=F.col(EVENT_ID) == F.col(tgt_id), how="left"
    ).drop(tgt_id)


def _source_values(pairs: DataFrame, source: DataFrame, value_col: str, src_id: str) -> DataFrame:
    vals = source.select(
        F.col(EVENT_ID).alias("_src_eid"), F.col(value_col).alias("_val")
    )
    return pairs.join(vals, on=F.col(src_id) == F.col("_src_eid"), how="inner")


def agg_count(
    pairs: DataFrame, target: DataFrame, axis: int = 1, out_col: str = "count"
) -> DataFrame:
    """Per-event number of intersecting partners; unmatched events get 0
    (sparse row sums are 0, ``relate.py:752-754``)."""
    tgt_id, _ = _tgt_src(axis)
    agg = pairs.groupBy(tgt_id).agg(F.count(F.lit(1)).alias(out_col))
    out = _join_back(target, agg, tgt_id)
    return out.fillna({out_col: 0})


def agg_sum(
    pairs: DataFrame,
    target: DataFrame,
    source: DataFrame,
    value_col: str,
    axis: int = 1,
    conserve: bool = False,
    out_col: Optional[str] = None,
) -> DataFrame:
    """``sum(w * v)`` per target; ``conserve=True`` first normalizes each
    *source* event's weights to sum to 1 (``relate.py:1085-1092``) so 100% of
    its value lands somewhere. Unmatched targets get 0.0 (empty sparse sum).
    """
    out_col = out_col or f"sum_{value_col}"
    tgt_id, src_id = _tgt_src(axis)
    w = _weight(pairs)
    joined = _source_values(pairs, source, value_col, src_id)
    if conserve:
        total = F.sum(w).over(Window.partitionBy(src_id))
        joined = joined.withColumn(
            "_w", F.when(total != 0.0, w / total).otherwise(w)
        )
        w = F.col("_w")
    agg = joined.groupBy(tgt_id).agg(F.sum(w * F.col("_val")).alias(out_col))
    out = _join_back(target, agg, tgt_id)
    return out.fillna({out_col: 0.0})


def agg_mean(
    pairs: DataFrame,
    target: DataFrame,
    source: DataFrame,
    value_col: str,
    axis: int = 1,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Weighted mean ``sum(w*v)/sum(w)``; NULL (NaN) when no matches or zero
    total weight (``relate.py:1158-1166``)."""
    out_col = out_col or f"mean_{value_col}"
    tgt_id, src_id = _tgt_src(axis)
    w = _weight(pairs)
    joined = _source_values(pairs, source, value_col, src_id)
    agg = joined.groupBy(tgt_id).agg(
        F.sum(w * F.col("_val")).alias("_num"), F.sum(w).alias("_den")
    )
    agg = agg.select(
        tgt_id,
        F.when(F.col("_den") != 0.0, F.col("_num") / F.col("_den")).alias(out_col),
    )
    return _join_back(target, agg, tgt_id)


def agg_mode(
    pairs: DataFrame,
    target: DataFrame,
    source: DataFrame,
    value_col: str,
    axis: int = 1,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Value with the largest summed weight per target.

    Ties break to the smallest value — the reference argmaxes over values in
    sorted-unique order (``relate.py:1284-1286``); zero-weight matches cannot
    win because sparse storage drops them (``relate.py:1936``), mirrored here
    by the ``w > 0`` filter. Targets with no positive-weight match get NULL
    (NaN / None, ``relate.py:1269-1273``).
    """
    out_col = out_col or f"mode_{value_col}"
    tgt_id, src_id = _tgt_src(axis)
    w = _weight(pairs)
    joined = _source_values(pairs, source, value_col, src_id).where(w > 0)
    scores = joined.groupBy(tgt_id, "_val").agg(F.sum(_weight(joined)).alias("_score"))
    pick = Window.partitionBy(tgt_id).orderBy(
        F.col("_score").desc(), F.col("_val").asc()
    )
    best = (
        scores.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(tgt_id, F.col("_val").alias(out_col))
    )
    return _join_back(target, best, tgt_id)


def agg_single(
    pairs: DataFrame,
    target: DataFrame,
    source: DataFrame,
    value_col: str,
    index: int = 0,
    axis: int = 1,
    out_col: Optional[str] = None,
) -> DataFrame:
    """k-th matching partner's value in source row order (``relate.py:760-878``).

    "Row order" is the source frame's original row order — its ``event_id``
    (the sparse matrix columns are reordered back to original index by the
    grouped wrapper, ``relate.py:1911-1918``). Out-of-bounds k -> NULL (NaN).
    Negative k counts from the end (last = -1).
    """
    out_col = out_col or f"single_{value_col}"
    tgt_id, src_id = _tgt_src(axis)
    joined = _source_values(pairs, source, value_col, src_id)
    if index >= 0:
        order = F.col(src_id).asc()
        rank_wanted = index + 1
    else:
        order = F.col(src_id).desc()
        rank_wanted = -index
    w = Window.partitionBy(tgt_id).orderBy(order)
    picked = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == rank_wanted)
        .select(tgt_id, F.col("_val").alias(out_col))
    )
    return _join_back(target, picked, tgt_id)


def agg_first(pairs, target, source, value_col, axis=1, out_col=None):
    return agg_single(
        pairs, target, source, value_col, index=0, axis=axis,
        out_col=out_col or f"first_{value_col}",
    )


def agg_last(pairs, target, source, value_col, axis=1, out_col=None):
    return agg_single(
        pairs, target, source, value_col, index=-1, axis=axis,
        out_col=out_col or f"last_{value_col}",
    )


def agg_list(
    pairs: DataFrame,
    target: DataFrame,
    source: DataFrame,
    value_col: str,
    axis: int = 1,
    out_col: Optional[str] = None,
) -> DataFrame:
    """All matching values as an array, in source row order
    (``relate.py:884-931``). Deterministic via sort_array over
    (source_id, value) structs. Unmatched -> empty array.
    """
    out_col = out_col or f"list_{value_col}"
    tgt_id, src_id = _tgt_src(axis)
    joined = _source_values(pairs, source, value_col, src_id)
    agg = joined.groupBy(tgt_id).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col(src_id), F.col("_val")))),
            lambda s: s._val,
        ).alias(out_col)
    )
    out = _join_back(target, agg, tgt_id)
    return out.withColumn(
        out_col,
        F.coalesce(
            F.col(out_col),
            F.array().cast(out.schema[out_col].dataType),
        ),
    )


def agg_set(
    pairs: DataFrame,
    target: DataFrame,
    source: DataFrame,
    value_col: str,
    axis: int = 1,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Distinct matching values, value-sorted (``relate.py:933-967``; the
    reference returns Python sets — order-free, so a sorted distinct array is
    the deterministic DataFrame equivalent)."""
    out_col = out_col or f"set_{value_col}"
    tgt_id, src_id = _tgt_src(axis)
    joined = _source_values(pairs, source, value_col, src_id)
    agg = joined.groupBy(tgt_id).agg(
        F.sort_array(F.collect_set(F.col("_val"))).alias(out_col)
    )
    out = _join_back(target, agg, tgt_id)
    return out.withColumn(
        out_col,
        F.coalesce(F.col(out_col), F.array().cast(out.schema[out_col].dataType)),
    )


def agg_value_counts(
    pairs: DataFrame,
    target: DataFrame,
    source: DataFrame,
    value_col: str,
    axis: int = 1,
) -> DataFrame:
    """Wide per-value match counts (``relate.py:972-1018``): one column per
    distinct value, zero-filled. Spark ``pivot`` bounds the distinct values
    first (explicit collect of the value domain — same contract as pandas'
    implicit one)."""
    tgt_id, src_id = _tgt_src(axis)
    joined = _source_values(pairs, source, value_col, src_id)
    wide = joined.groupBy(tgt_id).pivot("_val").agg(F.count(F.lit(1)))
    out = _join_back(target, wide, tgt_id)
    # zero-fill via backticked coalesce (pivot names may contain dots,
    # which fillna would misread as nested-field paths)
    pivot_cols = [c for c in wide.columns if c != tgt_id]
    keep = [F.col(f"`{c}`") for c in target.columns]
    filled = [
        F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) for c in pivot_cols
    ]
    return out.select(*keep, *filled)
