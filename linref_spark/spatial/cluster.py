"""Transitive proximity clustering + DataFrame-native connected components.

From-scratch Spark re-expression of ``LRS_Accessor.cluster``
(``/root/reference/linref/ext/base.py:2846-2970``) and
``EventsRelation.connected_components`` (``relate.py:1790-1814``):

1. buffer event measures by ``max_gap`` (points become ``loc +/- gap``
   ranges, ``modify.extend`` semantics);
2. self-intersect within route (strict overlap unless ``enforce_edges``);
3. optionally add cross-group edges between rows sharing ``link_col``
   values (the reference links *adjacent rows in sorted link order* — a
   chain, not a clique (``ext/base.py:2948-2962``); connectivity-equivalent
   and O(n) edges, reproduced here);
4. label connected components; labels are dense ranks of each component's
   minimum event_id, matching scipy's first-visit numbering.

Connected components runs iteratively in DataFrames (no GraphFrames
dependency): alternating min-label propagation over edges with pointer
jumping (label <- label of label), converging in O(log n) rounds; each round
is two shuffles. Lineage is truncated per round with
:func:`linref_spark.events.frame.materialize` (localCheckpoint locally;
reliable checkpoint when a checkpoint dir is set) so plans stay bounded.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linref_spark.events.frame import global_ordinal_id, materialize
from linref_spark.events.modify import extend as extend_events
from linref_spark.lrs import EVENT_ID, LRS
from linref_spark.relate.join import EQUI, JoinStrategy, intersect_pairs


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = EVENT_ID,
    src_col: str = "src",
    dst_col: str = "dst",
    out_col: str = "component",
    max_iter: int = 50,
) -> DataFrame:
    """Label nodes with their connected component.

    ``edges`` is an undirected edge list (each pair once is enough);
    ``nodes`` supplies the full node set (isolated nodes become singleton
    components). Output: nodes + ``out_col`` = min node id in the component.
    """
    # symmetrize once; labels start as the node id
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    sym = materialize(sym.where(F.col("a") != F.col("b")).distinct())

    labels = materialize(nodes.select(
        F.col(node_col).alias("n"), F.col(node_col).alias("lbl")
    ))

    for _ in range(max_iter):
        # neighbor-min propagation
        nbr_min = (
            sym.join(labels, on=F.col("b") == F.col("n"), how="inner")
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new = labels.join(nbr_min, on=F.col("n") == F.col("a"), how="left").select(
            "n", F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl")
        )
        # pointer jumping: lbl <- lbl(lbl)
        jump = new.select(F.col("n").alias("n2"), F.col("lbl").alias("lbl2"))
        new = materialize(
            new.join(jump, on=F.col("lbl") == F.col("n2"), how="left")
            .select("n", F.least("lbl", F.coalesce("lbl2", "lbl")).alias("lbl"))
        )
        changed = (
            new.join(labels.withColumnRenamed("lbl", "old"), on="n")
            .where(F.col("lbl") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break

    return nodes.join(
        labels.select(F.col("n"), F.col("lbl").alias(out_col)),
        on=F.col(node_col) == F.col("n"),
        how="left",
    ).drop("n")


def cluster(
    df: DataFrame,
    lrs: LRS,
    max_gap: float,
    name: str = "cluster",
    link_cols: Optional[Sequence[str]] = None,
    enforce_edges: Optional[bool] = None,
    strategy: JoinStrategy = EQUI,
    dense_labels: bool = True,
    max_broadcast_components: int = 1_000_000,
) -> DataFrame:
    """Proximity clustering (``ext/base.py:2846-2970``); adds ``name``
    (long, dense 0-based labels in first-occurrence order). Pass
    ``dense_labels=False`` to keep raw min-event-id labels (skips the
    relabel join entirely; labels stay unique and stable, just not dense).

    The dense relabel joins the distinct-component table back to the rows;
    with sparse edges that table approaches the row count, so broadcasting
    it unconditionally could OOM at exactly the scale this targets. A
    bounded ``limit(n+1).count()`` probe (mirroring
    ``project_points_broadcast``'s max_routes guard) picks broadcast only
    when the component count is at most ``max_broadcast_components``;
    above it the relabel falls back to a plain shuffle join."""
    if max_gap < 0:
        raise ValueError("max_gap must be non-negative.")

    if max_gap > 0:
        buffered = extend_events(df, lrs, max_gap)
        blrs = (
            LRS(key_cols=lrs.key_cols, beg_col="beg", end_col="end")
            if lrs.is_point
            else lrs
        )
    else:
        buffered, blrs = df, lrs

    if blrs.is_point:
        if enforce_edges is not None:
            raise ValueError("enforce_edges is not applicable to point events.")
        pairs = intersect_pairs(buffered, buffered, blrs, blrs, strategy=strategy)
    else:
        pairs = intersect_pairs(
            buffered, buffered, blrs, blrs,
            enforce_edges=bool(enforce_edges), strategy=strategy,
        )
    edges = pairs.where(F.col("left_id") < F.col("right_id")).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    )

    if link_cols:
        # chain edges between rows sharing link values (non-null only)
        w = Window.partitionBy(*[F.col(c) for c in link_cols]).orderBy(
            F.col(EVENT_ID)
        )
        linked = df.na.drop(subset=list(link_cols)).select(
            F.col(EVENT_ID).alias("src"),
            F.lead(F.col(EVENT_ID)).over(w).alias("dst"),
        ).where(F.col("dst").isNotNull())
        edges = edges.unionByName(linked)

    labeled = connected_components(edges, df, out_col="_comp")
    if not dense_labels:
        # scale path: component label = min event_id in the component —
        # stable, unique, no relabel pass
        return labeled.withColumnRenamed("_comp", name)
    # dense labels in first-visit (min event_id) order, matching scipy.
    # Relabel over the DISTINCT component ids (<< rows) with a distributed
    # ordinal — no unpartitioned dense_rank over the full table.
    comps = labeled.select(F.col("_comp").alias("_c")).distinct()
    comps = global_ordinal_id(comps, ["_c"], "_dense")
    small = (
        comps.limit(max_broadcast_components + 1).count()
        <= max_broadcast_components
    )
    out = labeled.join(
        F.broadcast(comps) if small else comps, on=F.col("_comp") == F.col("_c")
    )
    return out.withColumn(name, F.col("_dense").cast("long")).drop(
        "_comp", "_c", "_dense"
    )
