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
and no global sort is required. Dense global ordinals (linref's 0..n-1
positional index) come from :func:`global_ordinal_id`: a range shuffle +
per-partition ``row_number`` + a tiny per-partition count offset — identical
output to an unpartitioned ``Window.orderBy`` ``row_number`` but with every
stage distributed (no single-task funnel). Pipelines that only need a stable
unique id should still prefer :func:`hash_event_id` (zero sort).
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


def materialize(df: DataFrame) -> DataFrame:
    """Pin a DataFrame's contents for consistent multi-branch reuse.

    Uses eager ``localCheckpoint`` by default (reference-tracked blocks, no
    CacheManager pinning). CAVEAT: localCheckpoint truncates lineage onto
    NON-REPLICATED executor-local blocks — on a multi-node cluster an
    executor loss (or dynamic-allocation decommission) permanently fails
    every downstream job over the frame instead of recomputing, and the
    eager cut also turns lazy plan construction into an immediate job. For
    cluster deployments, call ``spark.sparkContext.setCheckpointDir(...)``
    first: this helper then upgrades to RELIABLE ``checkpoint()`` (blocks on
    fault-tolerant storage, survives executor loss) at the cost of a
    write-out. Local mode keeps the cheap path.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def global_ordinal_id(
    df: DataFrame,
    order_cols: Sequence,
    out_col: str = EVENT_ID,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Dense 0-based global ordinal over a total order — distributed.

    Equivalent to ``row_number().over(Window.orderBy(*order_cols)) - 1`` but
    without the single-task global sort: range-partition on the order key
    (equal keys co-locate), take a per-partition ``row_number``, then add a
    per-partition offset computed from a tiny count aggregation (one row per
    shuffle partition; its cumulative-sum window is over that tiny table,
    broadcast back). Every stage runs on all partitions, so this survives
    100x scale where the global window funnels the whole table into one task.

    The ordinal is boundary-independent: whatever range boundaries the
    partitioner samples, rank-in-total-order is unchanged. Pass tie-breaking
    columns for full determinism (ties co-locate but number arbitrarily,
    exactly as with a global window).

    ONE full-data shuffle (the range partition): the partition-local index
    comes from ``monotonically_increasing_id`` evaluated after
    ``sortWithinPartitions`` — Spark documents its layout as partition id in
    the upper 31 bits, record number within the partition in the lower 33
    (deterministic here because the in-partition order is pinned by the
    sort) — so no second hash exchange for a per-pid window is needed.

    CONSISTENCY REQUIREMENT: the per-partition counts and the data rows
    must observe the SAME range boundaries. Each separate plan instance
    samples its own boundaries, and reservoir sampling is row-order
    dependent — when the input is itself a shuffle output (randomized
    block-fetch order), two instantiations can draw DIFFERENT boundaries,
    silently corrupting the offsets. The eager ``localCheckpoint`` below
    makes both branches read one shared materialization (one partitioner,
    computed exactly once; MEMORY_AND_DISK blocks); it is what makes the
    ordinal correct, not an optimization. See :func:`materialize` for the
    executor-loss caveat and the reliable-checkpoint opt-in for clusters
    (set a checkpoint dir and this path upgrades automatically). Unlike
    ``persist`` (whose
    InMemoryRelation lives in the CacheManager until an explicit
    unpersist), checkpoint blocks are reference-tracked: once the caller
    drops the returned DataFrame, the ContextCleaner reclaims them — so
    iterative pipelines calling dissolve/resegment/integrate repeatedly do
    not accumulate session-lifetime cache entries
    (tests/test_scale_ids.py::test_ordinal_storage_reclaimed). Pipelines
    that cannot afford the materialization should mint ids with
    :func:`hash_event_id` instead.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions is None:
        # pinned count also keeps AQE from coalescing branches differently
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    part = df.repartitionByRange(num_partitions, *cols)
    mask33 = (1 << 33) - 1
    part = (
        part.sortWithinPartitions(*cols)
        .withColumn("_ord_mid", F.monotonically_increasing_id())
        .withColumn("_ord_pid", F.shiftright(F.col("_ord_mid"), 33))
        .withColumn("_ord_local", F.col("_ord_mid").bitwiseAND(F.lit(mask33)))
        .drop("_ord_mid")
    )
    part = materialize(part)
    counts = part.groupBy("_ord_pid").agg(F.count(F.lit(1)).alias("_ord_n"))
    # deliberately single-partition: `counts` has one row per shuffle
    # partition (tiny by construction). Partitioning by a constant is
    # physically identical to an unpartitioned window (one hash partition)
    # but keeps WindowExec's "No Partition Defined" WARN out of the logs,
    # where it would bury real single-partition regressions.
    w_off = Window.partitionBy(F.lit(0)).orderBy("_ord_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_ord_off", F.coalesce(F.sum("_ord_n").over(w_off), F.lit(0)).cast("long")
    ).drop("_ord_n")
    out = part.join(F.broadcast(offsets), on="_ord_pid")
    return out.withColumn(
        out_col, (F.col("_ord_off") + F.col("_ord_local")).cast("long")
    ).drop("_ord_pid", "_ord_local", "_ord_off")


def dense_prefix_sum(
    df: DataFrame,
    id_col: str,
    val_col: str,
    out_col: str,
    bucket_bits: int = 20,
) -> DataFrame:
    """Distributed INCLUSIVE prefix sum of ``val_col`` in ascending
    ``id_col`` order (ids must be unique longs; arithmetic shift keeps
    negative ids ordered). Two-level: local cumsum within ``id >>
    bucket_bits`` buckets + per-bucket offsets cumulated over the tiny
    bucket-total table (broadcast back). Unlike :func:`global_ordinal_id`
    the bucketing is a pure function of the DATA, so separate plan
    branches agree by construction — no persist needed.
    """
    d = df.withColumn("_ps_bk", F.shiftright(F.col(id_col), bucket_bits))
    w_local = Window.partitionBy("_ps_bk").orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = d.withColumn("_ps_loc", F.sum(F.col(val_col)).over(w_local))
    totals = d.groupBy("_ps_bk").agg(F.sum(F.col(val_col)).alias("_ps_bt"))
    # constant partition key = same single-partition plan, no WARN noise
    # (totals is one row per bucket — tiny; see global_ordinal_id)
    w_off = Window.partitionBy(F.lit(0)).orderBy("_ps_bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_ps_off", F.coalesce(F.sum("_ps_bt").over(w_off), F.lit(0)).cast("long")
    ).drop("_ps_bt")
    out = d.join(F.broadcast(offsets), on="_ps_bk")
    return out.withColumn(
        out_col, (F.col("_ps_off") + F.col("_ps_loc")).cast("long")
    ).drop("_ps_bk", "_ps_loc", "_ps_off")


def add_event_id(
    df: DataFrame, lrs: Optional[LRS] = None, order_by: Optional[Sequence] = None
) -> DataFrame:
    """Assign a deterministic 0-based ``event_id`` by canonical sort.

    Reproduces linref's positional index semantics (``index_data``,
    ``base.py:408-455``) exactly, via the distributed
    :func:`global_ordinal_id` (no single-task sort). Pipelines that only
    need a stable unique id should prefer :func:`hash_event_id` (zero sort).
    """
    if EVENT_ID in df.columns:
        return df
    if order_by is None:
        if lrs is None:
            raise ValueError("Provide an LRS or explicit order_by for event ids.")
        order_by = canonical_order_cols(lrs)
    return global_ordinal_id(df, list(order_by), EVENT_ID)


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


def assert_dense_ids(df: DataFrame, caller: str) -> None:
    """Eagerly verify ``event_id`` is a dense 0..n-1 ordinal.

    The id-adjacency operators (``consecutive_strings``, the ungrouped
    ``next_*`` predicates, ``dissolve(sort=False)``) recover neighbors via
    an equi-join on ``event_id +/- 1`` — with NON-dense ids (e.g. minted by
    :func:`hash_event_id` or ``integrate(dense_ids=False)``) that join
    silently matches nothing and every row looks like a run start. This
    guard turns that silent wrong answer into an error at the cost of one
    narrow aggregation pass; hot paths that KNOW their ids came from
    :func:`add_event_id` can skip it with ``check_dense=False``.
    """
    row = df.agg(
        F.min(F.col(EVENT_ID)).alias("mn"),
        F.max(F.col(EVENT_ID)).alias("mx"),
        F.count(F.lit(1)).alias("n"),
        # min/max/count alone is necessary but not sufficient: {0,1,1,3}
        # passes yet breaks the +/-1 adjacency join — distinctness closes it
        F.countDistinct(F.col(EVENT_ID)).alias("nd"),
    ).first()
    if row["n"] == 0:
        return
    if row["mn"] != 0 or row["mx"] != row["n"] - 1 or row["nd"] != row["n"]:
        raise ValueError(
            f"{caller} requires dense 0..n-1 event ids (got min={row['mn']}, "
            f"max={row['mx']}, n={row['n']}). Mint ids with add_event_id "
            "(hash_event_id / integrate(dense_ids=False) ids are not dense); "
            "pass check_dense=False only when density is already guaranteed."
        )


def _next_beg_in_group(df: DataFrame, lrs: LRS, check_dense: bool = True):
    """(df', next-beg column) where next = the next row in collection
    order within the same group.

    Grouped frames use a route-partitioned ``lead`` window (distributed by
    key). Ungrouped frames would need an UNPARTITIONED window (single
    task), so they instead recover the next row by an equi-join on
    ``event_id + 1`` — requires the dense ids :func:`add_event_id` mints,
    and stays fully distributed.
    """
    if lrs.is_grouped:
        w = _group_window(lrs, [F.col(EVENT_ID)])
        return df, F.lead(F.col(lrs.beg_col)).over(w)
    if check_dense:
        assert_dense_ids(df, "ungrouped next_* predicate")
    nxt = df.select(
        (F.col(EVENT_ID) - 1).alias("_nx_id"),
        F.col(lrs.beg_col).alias("_nx_beg"),
    )
    out = df.join(nxt, on=F.col(EVENT_ID) == F.col("_nx_id"), how="left").drop(
        "_nx_id"
    )
    return out, F.col("_nx_beg")


def next_overlapping(
    df: DataFrame, lrs: LRS, enforce_edges: bool = False,
    out_col: str = "next_overlapping", check_dense: bool = True,
) -> DataFrame:
    """Per-row flag: does this row overlap the next row (same group)?

    cf. ``base.py:841-877``; rows without a next same-group row get NULL->False.
    Row order is raw collection order (event_id), matching direct EventsData
    calls on already-sorted frames.
    """
    d, nxt_beg = _next_beg_in_group(df, lrs, check_dense)
    cmp = nxt_beg <= F.col(lrs.end_col) if enforce_edges else nxt_beg < F.col(lrs.end_col)
    out = d.withColumn(out_col, F.coalesce(cmp, F.lit(False)))
    return out.drop("_nx_beg")


def next_consecutive(
    df: DataFrame, lrs: LRS, out_col: str = "next_consecutive",
    check_dense: bool = True,
) -> DataFrame:
    """Per-row flag: next same-group row begins exactly where this row ends
    (``base.py:879-913``)."""
    d, nxt_beg = _next_beg_in_group(df, lrs, check_dense)
    out = d.withColumn(
        out_col, F.coalesce(nxt_beg == F.col(lrs.end_col), F.lit(False))
    )
    return out.drop("_nx_beg")


def consecutive_strings(
    df: DataFrame, lrs: LRS, out_col: str = "string_id", bucket_bits: int = 20,
    check_dense: bool = True,
) -> DataFrame:
    """Run id of chained (end == next beg, same group) events.

    ``base.py:915-930``: res[1:] = cumsum(~next_consecutive). Run ids are
    global (cumsum over collection order) to match linref.

    Requires dense 0..n-1 ``event_id`` (:func:`add_event_id`) — collection
    order IS the id, so:

    - the previous row is recovered by an equi-join on ``event_id - 1``
      (distributed; no global ``lag`` window);
    - the global cumsum is a two-level distributed prefix sum: local cumsum
      within ``event_id >> bucket_bits`` buckets, plus per-bucket offsets
      from a cumulative sum over the (n / 2^bucket_bits)-row bucket-total
      table. At 10^12 rows the bucket table is ~10^6 rows — the only
      single-task stage touches that tiny table.

    ``check_dense=True`` (default) verifies the density precondition with
    one cheap aggregation; non-dense ids would otherwise silently make
    every row a run start.
    """
    if check_dense:
        assert_dense_ids(df, "consecutive_strings")
    prev_cols = [
        (F.col(EVENT_ID) + 1).alias("_pv_id"),
        F.col(lrs.end_col).alias("_pv_end"),
    ]
    if lrs.is_grouped:
        prev_cols.extend(F.col(k).alias(f"_pv_{k}") for k in lrs.key_cols)
    prev = df.select(*prev_cols)
    j = df.join(prev, on=F.col(EVENT_ID) == F.col("_pv_id"), how="left")
    same_group = F.lit(True)
    if lrs.is_grouped:
        for k in lrs.key_cols:
            same_group = same_group & (F.col(f"_pv_{k}") == F.col(k))
    is_consec = (
        F.col("_pv_end").isNotNull()
        & same_group
        & (F.col("_pv_end") == F.col(lrs.beg_col))
    )
    flagged = j.withColumn(
        "_nr", F.when(is_consec, F.lit(0)).otherwise(F.lit(1)).cast("long")
    ).drop("_pv_id", "_pv_end", *[f"_pv_{k}" for k in (lrs.key_cols if lrs.is_grouped else ())])

    out = dense_prefix_sum(flagged, EVENT_ID, "_nr", out_col, bucket_bits)
    return out.withColumn(out_col, F.col(out_col) - 1).drop("_nr")


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
