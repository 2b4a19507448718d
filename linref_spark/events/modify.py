"""Event engineering: dissolve / resegment / separate / concatenate /
extend / shift / round / point_to_linear.

From-scratch Spark re-expressions of
``/root/reference/linref/events/modify.py`` (semantics cited per function).
The reference's per-event Python loops (notably resegment's bounds loop,
``modify.py:385-413``) become ``posexplode(sequence(...))`` + ``when``
arithmetic; dissolve's run detection becomes window sessionization. No UDFs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from linref_spark.events.analyze import find_inside, find_same
from linref_spark.events.frame import (
    centers_col,
    consecutive_strings,
    dense_prefix_sum,
    global_ordinal_id,
    lengths_col,
)
from linref_spark.lrs import EVENT_ID, LRS, apply_geometry_sync

SEGMENT_FILL_ALL = {"none", "cut", "left", "right", "extend", "balance"}
SOURCE_ID = "source_event_id"


def dissolve(
    df: DataFrame,
    lrs: LRS,
    retain: Sequence[str] = (),
    sort: bool = True,
    members_col: Optional[str] = None,
) -> DataFrame:
    """Merge consecutive (end == next beg, same group [+retain]) events into
    single spans.

    Semantics: ``modify.dissolve`` (``/root/reference/linref/events/
    modify.py:6-100``) — runs are found via ``consecutive_strings`` (cumsum
    over ~next_consecutive); each run becomes one event spanning first beg ..
    last end. ``retain`` extends the grouping key as the accessor does
    (``linref/ext/base.py:1895-1906``).

    Spark-first: classic sessionization. ``sort=True`` (the useful mode)
    orders within (keys + retain) by (beg, end, event_id) — the window
    partitions by route so the whole operation is one shuffle. ``sort=False``
    reproduces raw-row-order runs (requires dense event ids): the "previous
    row" comes from an equi-join on ``event_id - 1`` and run ids from the
    bucketed distributed prefix sum — no global window.

    Output: one row per dissolved span with columns keys+retain, beg, end,
    ``n_events``, optional ``members_col`` (sorted source event_id array),
    and a fresh 0-based ``event_id`` in canonical order.
    """
    if not lrs.is_linear:
        raise ValueError("dissolve requires linear events")
    keys = [*lrs.key_cols, *retain]
    beg, end = F.col(lrs.beg_col), F.col(lrs.end_col)

    if sort:
        w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
            beg.asc(), end.asc(), F.col(EVENT_ID).asc()
        )
        new_run = F.when(F.lag(end).over(w) == beg, F.lit(0)).otherwise(F.lit(1))
        run = F.sum(new_run).over(w.rowsBetween(Window.unboundedPreceding, 0))
        sessioned = df.withColumn("_run", run)
    else:
        # raw-row-order runs over dense ids — distributed prefix sum, keyed
        # on (keys + retain) adjacency, exactly consecutive_strings but with
        # the extended grouping key
        run_lrs = LRS(key_cols=tuple(keys), beg_col=lrs.beg_col, end_col=lrs.end_col)
        sessioned = consecutive_strings(df, run_lrs, out_col="_run")

    aggs = [
        F.min(beg).alias(lrs.beg_col),
        F.max(end).alias(lrs.end_col),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if members_col:
        aggs.append(F.sort_array(F.collect_list(F.col(EVENT_ID))).alias(members_col))
    out = sessioned.groupBy(*keys, "_run").agg(*aggs).drop("_run")
    # fresh dense ids in canonical order — distributed (range shuffle +
    # per-partition offsets), identical values to a global row_number
    return global_ordinal_id(out, [*keys, lrs.beg_col, lrs.end_col], EVENT_ID)


def resegment(
    df: DataFrame,
    lrs: LRS,
    length: float = 1.0,
    fill: str = "cut",
) -> DataFrame:
    """Split each event into ``length``-sized segments.

    Semantics: ``modify.resegment`` (``modify.py:306-433``), all six fill
    modes:

    - ``none``   floor count, grid ends, terminal gap dropped (but a
      shorter-than-length event still yields one cut segment);
    - ``cut``    ceil count, last segment truncated at the original end;
    - ``left``   ceil count, last segment anchored at the end, full length
      back (may overlap the previous segment);
    - ``right``  ceil count, last segment stays on the grid, extending past
      the original end;
    - ``extend`` floor count, last segment absorbs the remainder;
    - ``balance`` cut if the remainder >= length/2 (or only one segment),
      else extend.

    Spark-first: the reference's per-event Python loop becomes a
    ``posexplode(sequence(0, n-1))``; all bound adjustments are ``when``
    expressions. Attributes ride along with the explode; the original id is
    kept as ``source_event_id`` (the inverse mapping / relation of
    ``modify.py:415-432``), and a fresh canonical ``event_id`` is assigned.
    """
    if not lrs.is_linear:
        raise ValueError("resegment requires linear events")
    if fill not in SEGMENT_FILL_ALL:
        raise ValueError(f"fill must be one of {sorted(SEGMENT_FILL_ALL)}")
    L = float(length)
    beg, end = F.col(lrs.beg_col), F.col(lrs.end_col)
    ln = end - beg

    if fill in ("none", "extend"):
        nseg = F.floor(ln / L).cast("long")
    else:
        nseg = F.ceil(ln / L).cast("long")
    df2 = df.withColumn("_nseg", nseg)

    if fill == "balance":
        # last default segment starts at beg + (nseg-1)*L; if the remainder
        # it would cover is < L/2 (and >1 segment), drop it and extend
        last_beg = beg + (F.col("_nseg") - 1).cast("double") * L
        drop_last = ((end - last_beg) < (L / 2.0)) & (F.col("_nseg") > 1)
        df2 = df2.withColumn("_extend_last", drop_last).withColumn(
            "_n", F.greatest(F.col("_nseg") - drop_last.cast("long"), F.lit(1))
        )
    else:
        df2 = df2.withColumn("_extend_last", F.lit(fill == "extend")).withColumn(
            "_n", F.greatest(F.col("_nseg"), F.lit(1))
        )

    # output event ids BEFORE the explode: the id of segment i of a source
    # is (exclusive prefix sum of _n over source ids) + i — computed on the
    # narrow pre-explode frame (a data-keyed prefix sum; no shuffle of the
    # exploded table, no persist). Identical values to a global
    # row_number over (source_id, _i).
    df2 = dense_prefix_sum(df2, EVENT_ID, "_n", "_cum")
    exploded = df2.select(
        "*", F.posexplode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("_i", "_junk")
    ).drop("_junk")

    i = F.col("_i").cast("double")
    seg_beg = beg + i * L
    seg_end = beg + (i + 1.0) * L
    is_last = F.col("_i") == (F.col("_n") - 1)

    # terminal-segment end adjustment (modify.py:393-409)
    if fill == "balance":
        # balance resolves per-event to cut or extend; both end at orig end
        seg_end = F.when(is_last, end).otherwise(seg_end)
    elif fill in ("cut", "left", "extend"):
        seg_end = F.when(is_last, end).otherwise(seg_end)
    elif fill == "none":
        # grid end normally; short events (nseg==0 -> single segment) cut
        seg_end = F.when(is_last & (F.col("_nseg") == 0), end).otherwise(seg_end)
    # fill == 'right': grid end always
    if fill == "left":
        seg_beg = F.when(is_last, end - L).otherwise(seg_beg)

    out = (
        exploded.withColumn("_seg_beg", seg_beg)
        .withColumn("_seg_end", seg_end)
        .withColumn(EVENT_ID + "_new", F.col("_cum") - F.col("_n") + F.col("_i"))
        .withColumnRenamed(EVENT_ID, SOURCE_ID)
        .withColumnRenamed(EVENT_ID + "_new", EVENT_ID)
        .drop(lrs.beg_col, lrs.end_col, "_nseg", "_n", "_extend_last", "_cum", "_i")
        .withColumnRenamed("_seg_beg", lrs.beg_col)
        .withColumnRenamed("_seg_end", lrs.end_col)
    )
    return out


def separate(
    df: DataFrame,
    lrs: LRS,
    anchor: str = "centers",
    method: str = "balanced",
    drop_short: bool = False,
) -> DataFrame:
    """Resolve overlaps among events (``modify.py:435-595``):

    1. identical (beg, end) duplicates: keep first, collapse the rest to
       zero length at their center;
    2. eclipsed events (contained in another, enforce_edges=True): collapse
       to zero length at their center;
    3. adjacent *valid* events (sorted by group, anchor asc, length desc)
       that still overlap are split at a method-dependent point:
       ``balanced`` (termini midpoint clamped between centers, overridden by
       the centers midpoint when it lies inside the overlap), ``center``,
       ``left`` (right event trimmed), ``right`` (left event trimmed).

    Spark-first: masks from :mod:`analyze` windows; the "previous/next valid
    row" pair arithmetic is a lag/lead window over the valid subset. Splits
    apply simultaneously from original bounds (vectorized in the reference),
    which lag/lead reproduces exactly. Original row order and all attribute
    columns are preserved; only measures change.
    """
    if anchor not in ("centers", "begs", "ends"):
        raise ValueError("anchor must be one of 'centers', 'begs', 'ends'")
    if method not in ("balanced", "center", "left", "right"):
        raise ValueError("method must be one of 'balanced','center','left','right'")
    if not lrs.is_linear:
        raise ValueError("separate requires linear events")

    beg, end = F.col(lrs.beg_col), F.col(lrs.end_col)
    center = centers_col(lrs)
    anchor_expr = {
        "centers": center,
        "begs": beg,
        "ends": end,
    }[anchor]

    # sort position within group: anchor asc, length desc, stable
    keys = [F.col(k) for k in lrs.key_cols]
    w_sort = Window.partitionBy(*keys).orderBy(
        anchor_expr.asc(), lengths_col(lrs).desc(), F.col(EVENT_ID).asc()
    )
    marked = df.withColumn("_pos", F.row_number().over(w_sort)).withColumn(
        "_center", center
    )
    # duplicates are judged in sorted order (the reference runs find_same on
    # the sorted events, modify.py:509-515): first occurrence by _pos wins
    dup_w = Window.partitionBy(*keys, beg, end).orderBy(F.col("_pos"))
    marked = marked.withColumn("_same", F.row_number().over(dup_w) > 1)
    marked = find_inside(marked, lrs, enforce_edges=True, out_col="_inside")
    marked = marked.withColumn("_elim", F.col("_same") | F.col("_inside"))

    valid = marked.where(~F.col("_elim"))
    w_adj = Window.partitionBy(*keys).orderBy(F.col("_pos"))

    prev_end = F.lag(end).over(w_adj)
    prev_center = F.lag(F.col("_center")).over(w_adj)
    next_beg = F.lead(beg).over(w_adj)
    next_center = F.lead(F.col("_center")).over(w_adj)

    def split_point(rights: Column, lefts: Column, c_l: Column, c_r: Column):
        overlapping = rights > lefts
        if method == "center":
            mids = (c_l + c_r) / 2.0
            mask = overlapping
        elif method == "left":
            mids = rights
            mask = overlapping
        elif method == "right":
            mids = lefts
            mask = overlapping
        else:  # balanced (modify.py:556-577)
            termini = F.least(F.greatest((rights + lefts) / 2.0, c_l), c_r)
            cmids = (c_l + c_r) / 2.0
            t_valid = overlapping & (rights >= termini) & (lefts <= termini)
            c_valid = overlapping & (rights >= cmids) & (lefts <= cmids)
            mids = F.when(c_valid, cmids).otherwise(
                F.when(t_valid, termini).otherwise(rights)
            )
            mask = t_valid | c_valid
        return mids, mask

    # pair with previous valid row adjusts this row's beg; with next, its end
    mid_p, mask_p = split_point(prev_end, beg, prev_center, F.col("_center"))
    mid_n, mask_n = split_point(end, next_beg, F.col("_center"), next_center)
    adjusted = valid.withColumn(
        "_new_beg",
        F.when(prev_end.isNotNull() & mask_p, mid_p).otherwise(beg),
    ).withColumn(
        "_new_end",
        F.when(next_beg.isNotNull() & mask_n, mid_n).otherwise(end),
    )

    eliminated = marked.where(F.col("_elim")).withColumn(
        "_new_beg", F.col("_center")
    ).withColumn("_new_end", F.col("_center"))

    out = (
        adjusted.unionByName(eliminated)
        .withColumn(lrs.beg_col, F.col("_new_beg"))
        .withColumn(lrs.end_col, F.col("_new_end"))
        .drop("_pos", "_center", "_same", "_inside", "_elim", "_new_beg", "_new_end")
    )
    if drop_short:
        out = out.where(F.col(lrs.end_col) - F.col(lrs.beg_col) > 0)
    return out


def concatenate(frames: Sequence[DataFrame]) -> DataFrame:
    """UNION ALL of structurally-identical event frames (``modify.py:102-180``)."""
    if not frames:
        raise ValueError("No events to concatenate.")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def extend(
    df: DataFrame, lrs: LRS, begin_by: float = 0.0, end_by: Optional[float] = None,
    geometry_sync: Optional[str] = None,
) -> DataFrame:
    """Extend ranges outward (``modify.py:182-225``); point events become
    linear ``loc +/- d``. Measure edit: geometry-sync guard applies
    (``ext/base.py:1479`` decorates this with _method_deprecates_geometry)."""
    df = apply_geometry_sync(df, lrs, "extend", geometry_sync)
    if end_by is None:
        end_by = begin_by
    if lrs.is_point:
        return df.withColumn("beg", F.col(lrs.loc_col) - begin_by).withColumn(
            "end", F.col(lrs.loc_col) + end_by
        )
    return df.withColumn(lrs.beg_col, F.col(lrs.beg_col) - begin_by).withColumn(
        lrs.end_col, F.col(lrs.end_col) + end_by
    )


def shift(
    df: DataFrame, lrs: LRS, distance: float,
    geometry_sync: Optional[str] = None,
) -> DataFrame:
    """Shift all measures (``modify.py:227-258``); geometry-sync guard
    applies (``ext/base.py:1521``)."""
    out = apply_geometry_sync(df, lrs, "shift", geometry_sync)
    if lrs.is_located:
        out = out.withColumn(lrs.loc_col, F.col(lrs.loc_col) + distance)
    if lrs.is_linear:
        out = out.withColumn(lrs.beg_col, F.col(lrs.beg_col) + distance)
        out = out.withColumn(lrs.end_col, F.col(lrs.end_col) + distance)
    return out


def round_measures(
    df: DataFrame,
    lrs: LRS,
    decimals: Optional[int] = None,
    factor: Optional[float] = None,
    geometry_sync: Optional[str] = None,
) -> DataFrame:
    """Round measures to decimals or to the nearest multiple of ``factor``
    (``modify.py:260-304``); geometry-sync guard applies
    (``ext/base.py:1553``)."""
    df = apply_geometry_sync(df, lrs, "round", geometry_sync)
    if decimals is not None:
        rounder = lambda c: F.round(c, decimals)  # noqa: E731
    elif factor is not None:
        rounder = lambda c: F.round(c / factor, 0) * factor  # noqa: E731
    else:
        raise ValueError("Either 'decimals' or 'factor' must be provided.")
    out = df
    for col in lrs.measure_cols():
        out = out.withColumn(col, rounder(F.col(col)))
    return out


def point_to_linear(
    df: DataFrame, lrs: LRS, beg_col: str = "beg", end_col: str = "end"
) -> DataFrame:
    """Copy loc into zero-length [beg, end] (``linref/ext/base.py:1239-1307``)."""
    if not lrs.is_located:
        raise ValueError("point_to_linear requires located events")
    return df.withColumn(beg_col, F.col(lrs.loc_col)).withColumn(
        end_col, F.col(lrs.loc_col)
    )
