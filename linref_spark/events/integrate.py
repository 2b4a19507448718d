"""Multi-layer interval integration ("least common intervals").

From-scratch Spark re-expression of
``/root/reference/linref/events/integration.py:6-160``: per group, the union
of all layers' begs+ends (+ locs when ``split_at_locs``) forms sorted-unique
edges; adjacent edge pairs are the integrated intervals; each interval is
related back to every linear layer (intersect, enforce_edges=False) and
annotated with the matching source event id per layer (first match by lowest
id when ``expand=False``; the full cross-product of matches across layers
when ``expand=True``). ``fill_gaps`` keeps intervals no layer matched.

Spark-first: the edge union is ``unionByName + explode + distinct`` (one
shuffle on (keys, edge)); intervals come from a ``lead`` window per group;
the relate-back reuses :func:`linref_spark.relate.join.intersect_pairs`;
expansion is a sequential left JOIN per layer (row growth = product of
per-layer match counts — exactly the reference's ``itertools.product``,
as a join instead of collect_list + explode). The single-related-layer
expand case (split_at_locs) short-circuits further: the relate join
itself carries the interval columns (``intersect_full``), no join-back.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linref_spark.events.frame import global_ordinal_id
from linref_spark.lrs import EVENT_ID, LRS
from linref_spark.relate.join import (
    AUTO,
    JoinStrategy,
    LEFT_ID,
    RIGHT_ID,
    intersect_full,
    intersect_pairs,
    resolve_auto,
)


def integrate(
    frames: Sequence[tuple[DataFrame, LRS]],
    fill_gaps: bool = False,
    split_at_locs: bool = False,
    expand: bool = False,
    strategy: JoinStrategy = AUTO,
    dense_ids: bool = True,
    relate_layers: "Optional[Sequence[int]]" = None,
) -> DataFrame:
    """Returns the integrated interval frame with columns:
    key cols (named as in the first frame), ``beg``, ``end``, ``event_id``,
    and one ``index_{i}`` column per input layer (long; -1 = no match).

    ``relate_layers`` limits which layers get the relate-back join (the
    expensive half of integrate): every layer still contributes EDGES, but
    layers not listed get a constant ``index_i = -1`` instead of an
    intersect-pairs pass, and the ``fill_gaps=False`` keep-filter runs
    over the related layers only. Callers that discard some index columns
    (split_at_locs keeps only the subject layer's) skip one full interval
    join + aggregation per unrelated layer — and, under ``expand``, the
    row cross-product with that layer's matches.
    """
    if not frames:
        raise ValueError("Must provide at least one event frame.")
    base_lrs = frames[0][1]
    keys = list(base_lrs.key_cols)
    if not keys:
        raise ValueError("integrate requires grouped events")

    # --- collect edges per layer -------------------------------------------
    edge_frames = []
    for df, lrs in frames:
        lrs.check_compatibility(base_lrs)
        edges = []
        if lrs.is_linear:
            edges.extend([F.col(lrs.beg_col), F.col(lrs.end_col)])
        if lrs.is_located and split_at_locs:
            edges.append(F.col(lrs.loc_col))
        if not edges:
            continue
        sel = [
            F.col(k).alias(bk) for k, bk in zip(lrs.key_cols, keys)
        ] + [F.explode(F.array(*[e.cast("double") for e in edges])).alias("_edge")]
        edge_frames.append(df.select(*sel))
    if not edge_frames:
        raise ValueError("No measure edges found among input frames.")
    all_edges = edge_frames[0]
    for ef in edge_frames[1:]:
        all_edges = all_edges.unionByName(ef)
    uniq = all_edges.distinct()

    related = (
        set(range(len(frames))) if relate_layers is None else set(relate_layers)
    )
    related_linear = [
        i for i, (_, lrs) in enumerate(frames) if lrs.is_linear and i in related
    ]
    fast_path = expand and not fill_gaps and len(related_linear) == 1
    fast_single = fast_path and not dense_ids

    # Resolve an AUTO strategy ONCE, against a stable stand-in for the
    # derived interval table: the interval plan is minted fresh every
    # call (localCheckpoint / new hash), so probing IT defeats the
    # resolution memo. The stand-in is the UNION of every layer's narrow
    # measure rows (point layers as zero-length [loc, loc]) — a pure
    # function of the stable source plans, so its semantic hash (and the
    # memo) holds across calls, and its per-group row count tracks the
    # interval occupancy within 2x (each linear row contributes two
    # edges). Probing any single layer instead would miss a hot group
    # contributed by a different layer — e.g. a dense point layer
    # splitting a sparse subject would go unseen and the relate-back
    # would run equi against millions of intervals on one route.
    # Resolution shapes the physical plan only; results are unaffected.
    if strategy.kind == "auto" and related_linear:
        r0_df, r0_lrs = frames[related_linear[0]]
        proxy_parts = []
        for df_k, lrs_k in frames:
            sel = [
                F.col(k).alias(nk) for k, nk in zip(lrs_k.key_cols, keys)
            ]
            if lrs_k.is_linear:
                sel.append(F.col(lrs_k.beg_col).cast("double").alias("beg"))
                sel.append(F.col(lrs_k.end_col).cast("double").alias("end"))
            elif lrs_k.is_located:
                sel.append(F.col(lrs_k.loc_col).cast("double").alias("beg"))
                sel.append(F.col(lrs_k.loc_col).cast("double").alias("end"))
            else:
                continue
            proxy_parts.append(
                df_k.select(*sel).withColumn(EVENT_ID, F.lit(0).cast("long"))
            )
        proxy = proxy_parts[0]
        for pp in proxy_parts[1:]:
            proxy = proxy.unionByName(pp)
        plrs = LRS(key_cols=tuple(keys), beg_col="beg", end_col="end")
        strategy = resolve_auto(proxy, r0_df, plrs, r0_lrs, strategy)

    # --- adjacent edge pairs -> intervals ----------------------------------
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col("_edge"))
    intervals = (
        uniq.withColumn("_next", F.lead(F.col("_edge")).over(w))
        .where(F.col("_next").isNotNull())
        .select(*keys, F.col("_edge").alias("beg"), F.col("_next").alias("end"))
    )
    if dense_ids:
        # dense interval ids in canonical order (linref's positional
        # index) — distributed ordinal, no single-task global window
        # (intervals are disjoint per key, so (keys, beg) is total).
        # global_ordinal_id already localCheckpoints its shuffle output, so
        # the per-layer relate-backs below recompute only a broadcast join
        # + projection on top of materialized blocks — no extra checkpoint.
        intervals = global_ordinal_id(intervals, [*keys, "beg"], EVENT_ID)
    else:
        # scale path: the id only keys the relate-back join — a hash of
        # the unique (keys, beg) is enough (zero sort, zero persist).
        # 128-bit md5 of the natural tuple: at the 10^12-row target a
        # 64-bit hash expects ~tens of thousands of birthday-colliding
        # pairs, which would silently conflate unrelated intervals in the
        # relate-back; 2^128 makes collisions negligible. concat_ws silently
        # DROPS null elements, so a bare join would conflate (null,'b') with
        # ('b',null); coalescing each key to a sentinel keeps every position
        # occupied and the separator byte then makes the encoding injective.
        intervals = intervals.withColumn(
            EVENT_ID,
            F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(k).cast("string"), F.lit("\x00null"))
                        for k in keys
                    ],
                    F.col("beg").cast("string"),
                )
            ),
        )
        # reference-tracked materialization (reused by every layer's
        # relate-back below); unlike .cache() this does not pin a
        # CacheManager entry for the session lifetime — blocks are
        # reclaimed when the caller drops the plan. materialize() upgrades
        # to reliable checkpoint() when a checkpoint dir is set (cluster
        # executor-loss safety — see events/frame.py:materialize).
        # SKIPPED on the single-layer fast path: the md5 ids are a pure
        # function of the data (separate instantiations agree, unlike the
        # ordinal path), and with the auto probe resolved against the
        # source layers the interval table has exactly ONE consumer — the
        # eager checkpoint would be a pure materialization barrier in the
        # middle of an otherwise fully pipelined query.
        if not fast_single:
            from linref_spark.events.frame import materialize

            intervals = materialize(intervals)
    ilrs = LRS(key_cols=tuple(keys), beg_col="beg", end_col="end")

    # --- relate intervals back to each layer --------------------------------

    # fast path: ONE related linear layer under expand + keep-matched-only
    # (split_at_locs) — the relate join itself carries the interval columns
    # (intersect_full), so the pair-table round-trip back onto the
    # intervals (Exchange + Sort on the interval id for both sides) is
    # skipped outright. Row multiset identical: one row per
    # (interval, match), unmatched intervals dropped, exactly what the
    # generic path's left join + index>=0 filter produces.
    if fast_path:
        i = related_linear[0]
        df_i, lrs_i = frames[i]
        idx_col = f"index_{i}"
        rel = intersect_full(
            intervals, df_i, ilrs, lrs_i, enforce_edges=False,
            strategy=strategy,
        ).withColumnRenamed(RIGHT_ID, idx_col)
        # mirrors the generic path's any_match filter exactly (a real
        # match whose source id were negative would be dropped there too)
        rel = rel.where(F.col(idx_col) >= 0)
        for j in range(len(frames)):
            if j != i:
                rel = rel.withColumn(f"index_{j}", F.lit(-1).cast("long"))
        return rel.select(
            *keys, "beg", "end", EVENT_ID,
            *[f"index_{j}" for j in range(len(frames))],
        )

    out = intervals
    for i, (df, lrs) in enumerate(frames):
        idx_col = f"index_{i}"
        if not lrs.is_linear or i not in related:
            out = out.withColumn(idx_col, F.lit(-1).cast("long"))
            continue
        pairs = intersect_pairs(
            intervals, df, ilrs, lrs, enforce_edges=False, strategy=strategy
        )
        if not expand:
            # first match per layer = argmax over the boolean row = lowest
            # source position (integration.py:104-110)
            matches = pairs.groupBy(LEFT_ID).agg(F.min(RIGHT_ID).alias(idx_col))
            out = out.join(
                matches, on=F.col(EVENT_ID) == F.col(LEFT_ID), how="left"
            ).drop(LEFT_ID)
            out = out.withColumn(idx_col, F.coalesce(F.col(idx_col), F.lit(-1)))
        else:
            # expand = one output row per (interval, match) — a direct left
            # join IS that cross-product (row multiset identical to the old
            # collect_list + explode round-trip, which paid an extra
            # ObjectHashAggregate + Exchange per layer to build arrays it
            # immediately exploded). Unmatched intervals keep one row, -1.
            matches = pairs.select(
                F.col(LEFT_ID), F.col(RIGHT_ID).alias(idx_col)
            )
            out = out.join(
                matches, on=F.col(EVENT_ID) == F.col(LEFT_ID), how="left"
            ).drop(LEFT_ID)
            out = out.withColumn(
                idx_col, F.coalesce(F.col(idx_col), F.lit(-1).cast("long"))
            )

    any_match = None
    for i, (df, lrs) in enumerate(frames):
        if not lrs.is_linear or i not in related:
            continue
        m = F.col(f"index_{i}") >= 0
        any_match = m if any_match is None else (any_match | m)
    if not fill_gaps and any_match is not None:
        out = out.where(any_match)
    return out
