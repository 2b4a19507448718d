"""Canonical event-frame helpers: deterministic ids, canonical sort, and the
adjacency predicates that power closure ``*_mod`` semantics and dissolve.

From-scratch Spark expressions of the row-adjacency analytics in
``/root/reference/linref/events/base.py``:

- ``sort_standard`` (``base.py:756-780``): canonical order = groups, begs,
  ends, locs.
- ``next_overlapping`` / ``next_consecutive`` / ``next_same_group``
  (``base.py:823-913``): predicates against the *next row* in collection
  order -> ``lead``/``lag`` window expressions.
- ``consecutive_strings`` (``base.py:915-930``): run ids of chained events ->
  running sum of "new run" flags (classic sessionization).
- ``modified_edges`` (``base.py:255-283``): which rows own a group-terminal
  (or gap-adjacent) edge under ``left_mod``/``right_mod`` closures.

Scale notes
-----------
Every window here partitions by the route key, so work distributes by route
and no global sort is required. ``add_event_id`` is the one deliberately
test-scale helper: it uses a global ``row_number`` to reproduce linref's
0..n-1 positional index exactly; production pipelines should mint ids from a
natural key instead (see ``hash_event_id``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from linref_spark.lrs import EVENT_ID, LRS

MOD_EDGE = "_mod_edge"


def canonical_order_cols(lrs: LRS) -> list[str]:
    """sort_standard key order: groups, begs, ends, locs (base.py:756-780)."""
    cols: list[str] = list(lrs.key_cols)
    if lrs.beg_col:
        cols.extend([lrs.beg_col, lrs.end_col])
    if lrs.loc_col:
        cols.append(lrs.loc_col)
    return cols


def add_event_id(
    df: DataFrame, lrs: Optional[LRS] = None, order_by: Optional[Sequence] = None
) -> DataFrame:
    """Assign a deterministic 0-based ``event_id`` by canonical sort.

    Reproduces linref's positional index semantics (``index_data``,
    ``base.py:408-455``) for parity testing. The global ``row_number`` funnels
    through one task — fine at test scale, wrong at 100 TB; large pipelines
    should carry a natural key and use :func:`hash_event_id`.
    """
    if EVENT_ID in df.columns:
        return df
    if order_by is None:
        if lrs is None:
            raise ValueError("Provide an LRS or explicit order_by for event ids.")
        order_by = canonical_order_cols(lrs)
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(EVENT_ID, F.row_number().over(w).cast("long") - 1)


def hash_event_id(df: DataFrame, natural_key_cols: Sequence[str]) -> DataFrame:
    """Scale-path id: 64-bit hash of a natural key (stable across retries,
    no single-task bottleneck). Collision-safe enough for 10^12 rows only
    when combined with a uniqueness audit; parity tests use add_event_id.
    """
    return df.withColumn(
        EVENT_ID, F.xxhash64(*[F.col(c) for c in natural_key_cols])
    )


def sort_standard(df: DataFrame, lrs: LRS) -> DataFrame:
    """Canonical display order (groups, begs, ends, locs)."""
    return df.orderBy(*canonical_order_cols(lrs))


def _group_window(lrs: LRS, order: Sequence[Column]) -> Window:
    if lrs.is_grouped:
        return Window.partitionBy(*[F.col(k) for k in lrs.key_cols]).orderBy(*order)
    return Window.partitionBy().orderBy(*order)


def _sorted_order(lrs: LRS, sorted_within_group: bool) -> list[Column]:
    """Row order used for adjacency predicates.

    ``sorted_within_group=True`` reproduces the grouped-operation wrapper
    (``relate.py:1843-1846``), which sort_standards each side before slicing
    per group; ``False`` reproduces raw collection order (ungrouped relate or
    direct EventsData method calls), where adjacency follows the original row
    order — here, ``event_id``.
    """
    if sorted_within_group:
        order = []
        if lrs.beg_col:
            order.extend([F.col(lrs.beg_col), F.col(lrs.end_col)])
        if lrs.loc_col:
            order.append(F.col(lrs.loc_col))
        order.append(F.col(EVENT_ID))  # stable tie-break, matches lexsort stability
        return order
    return [F.col(EVENT_ID)]


def with_modified_edges(
    df: DataFrame, lrs: LRS, sorted_within_group: bool = True, out_col: str = MOD_EDGE
) -> DataFrame:
    """Flag rows whose terminal edge is "modified" under ``*_mod`` closure.

    Semantics from ``EventsData.modified_edges`` (``base.py:255-283``):

    - point events: never modified (all False);
    - ``left_mod``: row i is modified iff it does NOT overlap-or-touch the
      next row in order (``begs[i+1] <= ends[i]`` with enforce_edges=True);
      the last row of each group is always modified;
    - ``right_mod``: mirrored against the previous row; first row of each
      group is always modified;
    - any other closure: all False.

    A window ``lead``/``lag`` per route key — no shuffle beyond the route
    hash partitioning the subsequent join needs anyway.
    """
    if lrs.is_point or not lrs.closed_mod:
        return df.withColumn(out_col, F.lit(False))

    order = _sorted_order(lrs, sorted_within_group)
    w = _group_window(lrs, order)
    beg, end = F.col(lrs.beg_col), F.col(lrs.end_col)
    if lrs.closed == "left_mod":
        nxt_beg = F.lead(beg).over(w)
        # overlapping-or-touching next row => NOT modified
        flag = F.when(nxt_beg.isNull(), F.lit(True)).otherwise(nxt_beg > end)
    else:  # right_mod
        prv_end = F.lag(end).over(w)
        flag = F.when(prv_end.isNull(), F.lit(True)).otherwise(beg > prv_end)
    return df.withColumn(out_col, flag)


def next_overlapping(
    df: DataFrame, lrs: LRS, enforce_edges: bool = False, out_col: str = "next_overlapping"
) -> DataFrame:
    """Per-row flag: does this row overlap the next row (same group)?

    cf. ``base.py:841-877``; rows without a next same-group row get NULL->False.
    Row order is raw collection order (event_id), matching direct EventsData
    calls on already-sorted frames.
    """
    w = _group_window(lrs, [F.col(EVENT_ID)])
    nxt_beg = F.lead(F.col(lrs.beg_col)).over(w)
    cmp = nxt_beg <= F.col(lrs.end_col) if enforce_edges else nxt_beg < F.col(lrs.end_col)
    return df.withColumn(out_col, F.coalesce(cmp, F.lit(False)))


def next_consecutive(
    df: DataFrame, lrs: LRS, out_col: str = "next_consecutive"
) -> DataFrame:
    """Per-row flag: next same-group row begins exactly where this row ends
    (``base.py:879-913``)."""
    w = _group_window(lrs, [F.col(EVENT_ID)])
    nxt_beg = F.lead(F.col(lrs.beg_col)).over(w)
    return df.withColumn(out_col, F.coalesce(nxt_beg == F.col(lrs.end_col), F.lit(False)))


def consecutive_strings(
    df: DataFrame, lrs: LRS, out_col: str = "string_id"
) -> DataFrame:
    """Run id of chained (end == next beg, same group) events.

    ``base.py:915-930``: res[1:] = cumsum(~next_consecutive). Expressed as a
    running sum of "starts a new run" flags over the collection order —
    sessionization with zero extra shuffles beyond the group partitioning.
    Run ids are global (cumsum over the whole collection) to match linref.
    """
    w_ord = Window.orderBy(F.col(EVENT_ID))
    prv_end = F.lag(F.col(lrs.end_col)).over(w_ord)
    new_run = F.lit(1)
    same_group = F.lit(True)
    if lrs.is_grouped:
        for k in lrs.key_cols:
            same_group = same_group & (F.lag(F.col(k)).over(w_ord) == F.col(k))
    is_consec = prv_end.isNotNull() & same_group & (prv_end == F.col(lrs.beg_col))
    new_run = F.when(is_consec, F.lit(0)).otherwise(F.lit(1))
    run_id = F.sum(new_run).over(
        Window.orderBy(F.col(EVENT_ID)).rowsBetween(Window.unboundedPreceding, 0)
    ) - 1
    return df.withColumn(out_col, run_id.cast("long"))


def lengths_col(lrs: LRS) -> Column:
    return F.col(lrs.end_col) - F.col(lrs.beg_col)


def centers_col(lrs: LRS) -> Column:
    return (F.col(lrs.beg_col) + F.col(lrs.end_col)) / F.lit(2.0)


def set_monotonic(df: DataFrame, lrs: LRS) -> DataFrame:
    """Force beg <= end per row (``base.py:657-673``) — least/greatest swap."""
    beg, end = F.col(lrs.beg_col), F.col(lrs.end_col)
    return df.withColumn("_b", F.least(beg, end)).withColumn(
        lrs.end_col, F.greatest(beg, end)
    ).withColumn(lrs.beg_col, F.col("_b")).drop("_b")
