"""constrain_to + impute_keys: accessor-level compositions.

From-scratch re-expressions of ``LRS_Accessor.constrain_to``
(``/root/reference/linref/ext/base.py:1983-2088``) and ``impute_keys``
(``ext/base.py:1587-1672``) as DataFrame compositions over the operators
already built (integrate, dissolve, relate aggregators).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linref_spark.events.integrate import integrate
from linref_spark.events.modify import dissolve as dissolve_op
from linref_spark.lrs import EVENT_ID, LRS
from linref_spark.relate import agg as AGG
from linref_spark.relate.join import AUTO, JoinStrategy, intersect_pairs


def constrain_to(
    df: DataFrame,
    other: DataFrame,
    lrs: LRS,
    other_lrs: LRS,
    dissolve: bool = True,
    inverse_col: str = "constrained_index",
    attr_cols: Optional[Sequence[str]] = None,
    strategy: JoinStrategy = AUTO,
) -> DataFrame:
    """Clip subject events to the coverage of reference events.

    Pipeline per the reference: integrate(subject, reference, expand=True)
    -> keep intervals matched by BOTH layers -> optionally dissolve
    contiguous pieces per source event -> re-join subject attributes by
    source id (left join). ``inverse_col`` holds the source event_id.
    """
    lrs.validate_frame(df)
    other_lrs.validate_frame(other)
    integrated = integrate(
        [(df, lrs), (other, other_lrs)],
        fill_gaps=False,
        expand=True,
        strategy=strategy,
        dense_ids=False,  # interval ids are dropped below; hash ids skip a sort
    )
    covered = integrated.where(
        (F.col("index_0") >= 0) & (F.col("index_1") >= 0)
    )
    keys = list(lrs.key_cols)
    # coverage semantics: one row per (interval, source event). The expand
    # cross-product also multiplies by reference matches; the reference
    # library documents overlapping reference events as unsupported
    # ("may produce unexpected results", ext/base.py:2003-2007) — here we
    # define the behavior as boolean coverage and dedupe.
    covered = covered.dropDuplicates([*keys, "beg", "end", "index_0"])
    ilrs = LRS(key_cols=tuple(keys), beg_col="beg", end_col="end", closed=lrs.closed)
    out = covered.withColumnRenamed("index_0", inverse_col).drop("index_1", EVENT_ID)
    if dissolve:
        # deterministic id (ties only between fully-identical rows, which
        # dissolve identically regardless of order)
        out = out.withColumn(
            EVENT_ID, F.xxhash64(*keys, F.col(inverse_col), F.col("beg"), F.col("end"))
        )
        # dissolve per source event: retain the inverse index as a key so
        # contiguous pieces of one source merge but sources never merge
        out = dissolve_op(out, ilrs, retain=[inverse_col], sort=True)
        out = out.drop("n_events")
    if attr_cols:
        attrs = df.select(
            F.col(EVENT_ID).alias("_src"), *attr_cols
        )
        out = out.join(attrs, on=F.col(inverse_col) == F.col("_src"), how="left")
        out = out.drop("_src")
    return out


def impute_keys(
    df: DataFrame,
    other: DataFrame,
    lrs: LRS,
    other_lrs: LRS,
    impute_cols: Sequence[str],
    strategy: JoinStrategy = AUTO,
) -> DataFrame:
    """Fill missing key columns on ``df`` from ``other`` via a reduced-key
    relation + first-match aggregation (``ext/base.py:1587-1672``).

    Both LRS bindings here carry the REDUCED key set (the keys shared by
    both frames); ``impute_cols`` are the columns copied from the first
    matching other-event.
    """
    pairs = intersect_pairs(df, other, lrs, other_lrs, strategy=strategy)
    out = df
    for col in impute_cols:
        out = AGG.agg_first(pairs, out, other, col, axis=1, out_col=f"_imp_{col}")
        if col in out.columns:
            out = out.withColumn(col, F.coalesce(F.col(col), F.col(f"_imp_{col}")))
            out = out.drop(f"_imp_{col}")
        else:
            out = out.withColumnRenamed(f"_imp_{col}", col)
    return out


def split_at_locs(
    df: DataFrame,
    locs_df: DataFrame,
    lrs: LRS,
    locs_lrs: LRS,
    inverse_col: str = "split_index",
    attr_cols: Optional[Sequence[str]] = None,
    strategy: JoinStrategy = AUTO,
) -> DataFrame:
    """Split linear events at point locations on the same routes.

    The interval-algebra core of ``LRS_Accessor.split``
    (``linref/ext/base.py:2091-2213``): integrate the subject with the
    point layer (``split_at_locs=True``) so every point inside an event
    becomes a cut edge; keep intervals belonging to a subject event; carry
    the source id (and optionally re-joined attributes). The reference's
    geometric mask-discovery leg (polygon boundary -> projected locs) is
    :func:`linref_spark.spatial.join.project_points_tiled` +
    :func:`linref_spark.spatial.join.clip_points` composed upstream.
    """
    lrs.validate_frame(df)
    integrated = integrate(
        [(df, lrs), (locs_df, locs_lrs)],
        fill_gaps=False,
        split_at_locs=True,
        expand=True,
        strategy=strategy,
        dense_ids=False,  # interval ids are dropped below; hash ids skip a sort
        relate_layers=[0],  # index_1 is discarded below — skip its join
    )
    out = integrated.where(F.col("index_0") >= 0)
    # no dedupe needed: integrate's intervals are unique per (keys, beg)
    # by construction (lead window over DISTINCT edges) and with a single
    # related layer each (interval, index_0) pair appears exactly once
    # (intersect_pairs emits one row per matching pair; the binned variant
    # ownership-dedupes) — a dropDuplicates here would be a provable no-op
    # costing a full extra shuffle (verified raw==dedup at sf0.01/sf0.1)
    out = out.withColumnRenamed("index_0", inverse_col).drop("index_1", EVENT_ID)
    if attr_cols:
        attrs = df.select(F.col(EVENT_ID).alias("_src"), *attr_cols)
        out = out.join(attrs, on=F.col(inverse_col) == F.col("_src"), how="left")
        out = out.drop("_src")
    return out
