"""User-facing accessor facade: one front door for chained workflows.

The reference's entire UX is the pandas accessor ``df.lr.*``
(``register_dataframe_accessor``, ``/root/reference/linref/ext/base.py:30``)
— the LRS binding rides along the DataFrame so users chain
``dissolve().resegment().relate(...)`` without re-threading column roles.
Spark DataFrames have no accessor registry, so the same ergonomics come
from a thin wrapper: :class:`LinrefFrame` holds ``(df, lrs)`` and delegates
every operator in this package, returning a re-wrapped frame whenever the
result still has event semantics (and a plain relation/DataFrame when not).

Nothing here adds execution logic — each method is a one-line delegation to
the module-level function (which remain the composable core API); the
wrapper only tracks how the LRS changes across calls (e.g. ``extend`` on a
point frame yields a linear frame) and threads the frame's
``geometry_sync`` default into measure-editing operators.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linref_spark.lrs import EVENT_ID, LRS
from linref_spark.events import analyze as _analyze
from linref_spark.events import frame as _frame
from linref_spark.events import modify as _modify
from linref_spark.events import constrain as _constrain
from linref_spark.events.integrate import integrate as _integrate
from linref_spark.relate import agg as _agg
from linref_spark.relate.distribute import distribute as _distribute
from linref_spark.relate.join import (
    AUTO,
    EQUI,
    JoinStrategy,
    equal_groups_pairs,
    intersect_pairs,
    overlay_pairs,
)


def wrap(
    df: DataFrame,
    key_cols: Sequence[str] = (),
    loc_col: Optional[str] = None,
    beg_col: Optional[str] = None,
    end_col: Optional[str] = None,
    closed: Optional[str] = None,
    geom_m_col: Optional[str] = None,
    geometry_sync: Optional[str] = None,
    add_ids: bool = True,
) -> "LinrefFrame":
    """Bind column roles to a DataFrame and return the chained facade —
    the Spark spelling of setting up ``df.lr`` (``linref/ext/lrs.py:9-62``
    + accessor binding). ``add_ids`` mints the canonical dense ``event_id``
    when absent.

    With NO role arguments, the package default LRS applies if one is
    registered via :func:`linref_spark.options.set_default_lrs` (the
    reference's ``linref/options.py:63-83`` registry); ``closed`` /
    ``geometry_sync`` still override the registered values per call.
    """
    from linref_spark.options import options

    roles_given = bool(key_cols) or any(
        x is not None for x in (loc_col, beg_col, end_col, geom_m_col)
    )
    if not roles_given and options.default_lrs is not None:
        lrs = options.default_lrs
        if closed is not None:
            lrs = replace(lrs, closed=closed)
        if geometry_sync is not None:
            lrs = replace(lrs, geometry_sync=geometry_sync)
    else:
        lrs = LRS(
            key_cols=tuple(key_cols),
            loc_col=loc_col,
            beg_col=beg_col,
            end_col=end_col,
            closed=closed if closed is not None else "right",
            geom_m_col=geom_m_col,
            geometry_sync=(
                geometry_sync
                if geometry_sync is not None
                else options.default_geometry_sync
            ),
        )
    lf = LinrefFrame(df, lrs)
    return lf.add_event_id() if add_ids else lf


class LinrefFrame:
    """A DataFrame + LRS pair whose methods mirror the reference's
    ``df.lr`` accessor surface, each delegating to the package operator."""

    def __init__(self, df: DataFrame, lrs: LRS):
        lrs.validate_frame(df)
        self.df = df
        self.lrs = lrs

    # -- plumbing -----------------------------------------------------------
    def _wrap(self, df: DataFrame, lrs: Optional[LRS] = None) -> "LinrefFrame":
        return LinrefFrame(df, lrs if lrs is not None else self.lrs)

    def with_lrs(self, **changes) -> "LinrefFrame":
        return self._wrap(self.df, replace(self.lrs, **changes))

    def with_closed(self, closed: str) -> "LinrefFrame":
        return self.with_lrs(closed=closed)

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def where(self, cond) -> "LinrefFrame":
        """``select``/``select_group``/``get_group`` role — deliberately a
        plain filter (COVERAGE.md §2.2)."""
        return self._wrap(self.df.where(cond))

    filter = where

    def select_group(self, **key_values) -> "LinrefFrame":
        cond = F.lit(True)
        for k, v in key_values.items():
            cond = cond & (F.col(k) == F.lit(v))
        return self.where(cond)

    def drop_invalid(self) -> "LinrefFrame":
        """``valid_events``/``drop_invalid``: drop rows with null/NaN
        measures."""
        out = self.df.na.drop(subset=self.lrs.measure_cols())
        for c in self.lrs.measure_cols():
            out = out.where(~F.isnan(F.col(c)))
        return self._wrap(out)

    def cache(self) -> "LinrefFrame":
        return self._wrap(self.df.cache())

    def count(self) -> int:
        return self.df.count()

    def collect(self):
        return self.df.collect()

    def show(self, *a, **kw):
        return self.df.show(*a, **kw)

    # -- ids & canonical order ---------------------------------------------
    def add_event_id(self, order_by: Optional[Sequence] = None) -> "LinrefFrame":
        return self._wrap(_frame.add_event_id(self.df, self.lrs, order_by))

    def hash_ids(self, natural_key_cols: Sequence[str]) -> "LinrefFrame":
        return self._wrap(_frame.hash_event_id(self.df, natural_key_cols))

    def sort_standard(self) -> "LinrefFrame":
        return self._wrap(_frame.sort_standard(self.df, self.lrs))

    def set_monotonic(self) -> "LinrefFrame":
        return self._wrap(_frame.set_monotonic(self.df, self.lrs))

    # -- analyze ------------------------------------------------------------
    def duplicated(self, **kw) -> "LinrefFrame":
        return self._wrap(_analyze.duplicated(self.df, self.lrs, **kw))

    def find_same(self, **kw) -> "LinrefFrame":
        return self._wrap(_analyze.find_same(self.df, self.lrs, **kw))

    def find_inside(self, **kw) -> "LinrefFrame":
        return self._wrap(_analyze.find_inside(self.df, self.lrs, **kw))

    def next_overlapping(self, **kw) -> "LinrefFrame":
        return self._wrap(_frame.next_overlapping(self.df, self.lrs, **kw))

    def next_consecutive(self, **kw) -> "LinrefFrame":
        return self._wrap(_frame.next_consecutive(self.df, self.lrs, **kw))

    def consecutive_strings(self, **kw) -> "LinrefFrame":
        return self._wrap(_frame.consecutive_strings(self.df, self.lrs, **kw))

    # -- modify -------------------------------------------------------------
    def dissolve(self, **kw) -> "LinrefFrame":
        return self._wrap(_modify.dissolve(self.df, self.lrs, **kw))

    def resegment(self, length: float = 1.0, fill: str = "cut") -> "LinrefFrame":
        return self._wrap(_modify.resegment(self.df, self.lrs, length, fill))

    def separate(self, **kw) -> "LinrefFrame":
        return self._wrap(_modify.separate(self.df, self.lrs, **kw))

    def concatenate(self, *others: "LinrefFrame") -> "LinrefFrame":
        frames = [self.df] + [o.df for o in others]
        return self._wrap(_modify.concatenate(frames))

    def extend(
        self, begin_by: float = 0.0, end_by: Optional[float] = None, **kw
    ) -> "LinrefFrame":
        out = _modify.extend(self.df, self.lrs, begin_by, end_by, **kw)
        lrs = self.lrs
        if lrs.is_point:  # points become [loc-d, loc+d] intervals
            lrs = replace(lrs, beg_col="beg", end_col="end")
        return self._wrap(out, lrs)

    def shift(self, distance: float, **kw) -> "LinrefFrame":
        return self._wrap(_modify.shift(self.df, self.lrs, distance, **kw))

    def round_measures(self, **kw) -> "LinrefFrame":
        return self._wrap(_modify.round_measures(self.df, self.lrs, **kw))

    def point_to_linear(
        self, beg_col: str = "beg", end_col: str = "end"
    ) -> "LinrefFrame":
        out = _modify.point_to_linear(self.df, self.lrs, beg_col, end_col)
        return self._wrap(out, replace(self.lrs, beg_col=beg_col, end_col=end_col))

    # -- accessor compositions ---------------------------------------------
    def constrain_to(self, other: "LinrefFrame", **kw) -> "LinrefFrame":
        out = _constrain.constrain_to(self.df, other.df, self.lrs, other.lrs, **kw)
        return LinrefFrame(
            out,
            LRS(key_cols=self.lrs.key_cols, beg_col="beg", end_col="end",
                closed=self.lrs.closed),
        )

    def impute_keys(
        self, other: "LinrefFrame", impute_cols: Sequence[str], **kw
    ) -> "LinrefFrame":
        return self._wrap(
            _constrain.impute_keys(
                self.df, other.df, self.lrs, other.lrs, impute_cols, **kw
            )
        )

    def split_at_locs(self, locs: "LinrefFrame", **kw) -> "LinrefFrame":
        out = _constrain.split_at_locs(
            self.df, locs.df, self.lrs, locs.lrs, **kw
        )
        return LinrefFrame(
            out,
            LRS(key_cols=self.lrs.key_cols, beg_col="beg", end_col="end",
                closed=self.lrs.closed),
        )

    def integrate_with(
        self, *others: "LinrefFrame", **kw
    ) -> "LinrefFrame":
        out = _integrate([(self.df, self.lrs), *[(o.df, o.lrs) for o in others]], **kw)
        return LinrefFrame(
            out, LRS(key_cols=self.lrs.key_cols, beg_col="beg", end_col="end")
        )

    def cluster(self, max_gap: float, **kw) -> "LinrefFrame":
        from linref_spark.spatial.cluster import cluster as _cluster

        return self._wrap(_cluster(self.df, self.lrs, max_gap, **kw))

    # -- geometry -----------------------------------------------------------
    def add_geom_m(
        self, xs_col: str = "geom_xs", ys_col: str = "geom_ys",
        out_col: str = "geom_m",
    ) -> "LinrefFrame":
        from linref_spark.geometry.udfs import add_geom_m as _add_geom_m

        out = _add_geom_m(self.df, self.lrs, xs_col, ys_col, out_col)
        return self._wrap(out, replace(self.lrs, geom_m_col=out_col))

    def from_wkb(self, wkb_col: str = "wkb", **kw) -> "LinrefFrame":
        """Parse a binary WKB LINESTRING[ M] column into ``geom_m``
        (GEOS-free; ``interop.frame_from_wkb``). The natural ingestion
        seam for GeoDataFrame users: ``gdf.geometry.to_wkb()`` bytes."""
        from linref_spark.interop import frame_from_wkb

        out_col = kw.get("out_col", "geom_m")
        out = frame_from_wkb(self.df, wkb_col, **kw)
        return self._wrap(out, replace(self.lrs, geom_m_col=out_col))

    def to_wkb(self, **kw) -> "LinrefFrame":
        """Emit ISO WKB LINESTRING M bytes from the bound ``geom_m``
        column (``interop.frame_to_wkb``)."""
        from linref_spark.interop import frame_to_wkb

        geom = self.lrs.geom_m_col or "geom_m"
        return self._wrap(frame_to_wkb(self.df, geom_col=geom, **kw))

    def project(self, points: DataFrame, **kw) -> DataFrame:
        """Snap a point table onto this frame's route geometries
        (spatial kNN; ``LRS_Accessor.project``). Auto-selects the
        broadcast-geometry kernel for small route tables and the
        tile-partitioned one for large networks (spatial/join.py)."""
        from linref_spark.spatial.join import project_points

        return project_points(self.df, points, self.lrs, **kw)

    def split_at_geometry(self, mask_xs, mask_ys, **kw) -> "LinrefFrame":
        """Split events wherever a mask polyline/polygon crosses their
        geometries (``LRS_Accessor.split``)."""
        from linref_spark.spatial.split import split_at_geometry as _split

        return self._wrap(_split(self.df, self.lrs, mask_xs, mask_ys, **kw))

    def clip(self, polygon_xs, polygon_ys, **kw) -> "LinrefFrame":
        """Clip events to a polygon (``LRS_Accessor.clip``): split at the
        boundary, keep inside/outside pieces by predicate."""
        from linref_spark.spatial.split import clip_events as _clip

        return self._wrap(_clip(self.df, self.lrs, polygon_xs, polygon_ys, **kw))

    def match_hausdorff(self, projected: DataFrame, buffer: float, **kw) -> DataFrame:
        """Match a projected line table onto this frame's geometries by
        substring Hausdorff score (``parallel_project_hausdorff``)."""
        from linref_spark.spatial.match import match_lines_hausdorff

        return match_lines_hausdorff(self.df, projected, self.lrs, buffer, **kw)

    def match_samples(self, projected: DataFrame, buffer: float, **kw) -> DataFrame:
        """Sample-point line matcher (``ParallelProjector``)."""
        from linref_spark.spatial.match import parallel_project_samples

        return parallel_project_samples(self.df, projected, self.lrs, buffer, **kw)

    # -- web-scale text / dedup / ANN ----------------------------------------
    # one-line delegations to linref_spark.web so a dedup + relate chain
    # runs through the same front door; id defaults to the canonical
    # event_id this facade mints.
    def with_token_stats(self, text_col: str = "text") -> "LinrefFrame":
        from linref_spark.web import textstats as _ts

        return self._wrap(_ts.with_token_stats(self.df, text_col))

    def with_quality_score(self, text_col: str = "text") -> "LinrefFrame":
        from linref_spark.web import textstats as _ts

        return self._wrap(_ts.with_quality_score(self.df, text_col))

    def with_lang_id(self, text_col: str = "text") -> "LinrefFrame":
        from linref_spark.web import textstats as _ts

        return self._wrap(_ts.with_lang_id(self.df, text_col))

    def with_fingerprint(self, text_col: str = "text") -> "LinrefFrame":
        from linref_spark.web import textstats as _ts

        return self._wrap(_ts.with_fingerprint(self.df, text_col))

    def with_bpe_token_count(self, text_col: str = "text") -> "LinrefFrame":
        from linref_spark.web import textstats as _ts

        return self._wrap(_ts.with_bpe_token_count(self.df, text_col))

    def dedup_exact(
        self, text_col: str = "text", id_col: str = EVENT_ID
    ) -> "LinrefFrame":
        from linref_spark.web import dedup as _dd

        return self._wrap(_dd.dedup_exact(self.df, text_col, id_col))

    def near_dup_groups(
        self, text_col: str = "text", id_col: str = EVENT_ID, **kw
    ) -> "LinrefFrame":
        """Append ``canonical_id`` (minhash-LSH -> connected components);
        keep ``id == canonical_id`` rows for a one-per-cluster dedup.
        Plain passthrough — the module function already returns the
        labeled full frame (``near_dup_labels`` for the bare table)."""
        from linref_spark.web import dedup as _dd

        return self._wrap(_dd.near_dup_groups(self.df, text_col, id_col, **kw))

    def minhash_pairs(
        self, text_col: str = "text", id_col: str = EVENT_ID, **kw
    ) -> DataFrame:
        from linref_spark.web import dedup as _dd

        return _dd.minhash_lsh_pairs(self.df, text_col, id_col, **kw)

    def simhash_pairs(
        self, text_col: str = "text", id_col: str = EVENT_ID, **kw
    ) -> DataFrame:
        from linref_spark.web import dedup as _dd

        return _dd.simhash_band_pairs(self.df, text_col, id_col, **kw)

    def ngram_jaccard_pairs(
        self, text_col: str = "text", id_col: str = EVENT_ID, **kw
    ) -> DataFrame:
        from linref_spark.web import dedup as _dd

        return _dd.ngram_jaccard_pairs(self.df, text_col, id_col, **kw)

    def ann_topk(
        self, queries: DataFrame, id_col: str = EVENT_ID,
        vec_col: str = "embedding", **kw
    ) -> DataFrame:
        """Exact brute-force cosine top-k against this frame as the corpus."""
        from linref_spark.web import ann as _ann

        return _ann.cosine_topk(
            self.df, queries, id_col=id_col, vec_col=vec_col, **kw
        )

    def ann_ivfpq_topk(
        self, queries: DataFrame, dim: int, id_col: str = EVENT_ID,
        vec_col: str = "embedding", **kw
    ) -> DataFrame:
        """IVF x PQ approximate top-k — the scale serving path."""
        from linref_spark.web import ann as _ann

        return _ann.ivfpq_topk(
            self.df, queries, dim, id_col=id_col, vec_col=vec_col, **kw
        )

    # -- relate -------------------------------------------------------------
    def relate(
        self,
        other: "LinrefFrame",
        how: str = "intersect",
        strategy: JoinStrategy = AUTO,
        **kw,
    ) -> "LinrefRelation":
        """Build the pair relation against ``other`` and return the chained
        aggregator handle (the reference's ``EventsRelation``,
        ``relate.py:600-706``). ``how``: intersect | overlay | equal_groups.

        Defaults to ``JoinStrategy("auto")`` — the facade caller is
        exactly the default-arguments user, and one input-stats job per
        ``.relate()`` is noise next to the join it protects. The module
        primitives (``intersect_pairs``/``overlay_pairs``) keep explicit
        strategies so repeated joins over the same inputs can amortize
        one decision.

        NOTE: the stats probe is an extra action over the inputs' NARROW
        projections (keys + measures; Catalyst prunes the rest), so it
        re-executes that slice of upstream lineage. The resolution is
        MEMOIZED on the semantic hash of the narrow plans (round 6), so
        an N-op chain over the same frames probes once; a frame at the
        tail of an expensive unpersisted chain still pays that first
        probe — persist it first or pass an explicit ``EQUI``/binned
        strategy."""
        if how == "intersect":
            pairs = intersect_pairs(
                self.df, other.df, self.lrs, other.lrs, strategy=strategy, **kw
            )
        elif how == "overlay":
            pairs = overlay_pairs(
                self.df, other.df, self.lrs, other.lrs, strategy=strategy, **kw
            )
        elif how == "equal_groups":
            pairs = equal_groups_pairs(
                self.df, other.df, self.lrs, other.lrs, strategy=strategy
            )
        else:
            raise ValueError(
                "how must be 'intersect', 'overlay', or 'equal_groups'"
            )
        return LinrefRelation(pairs, self, other)


class LinrefRelation:
    """Pair table + both frames: chained aggregators (``EventsRelation``).

    ``axis=1`` aggregates source values onto the left/target frame (the
    default, like the reference); ``.T`` flips it (``relate.py:708-717``).
    """

    def __init__(
        self,
        pairs: DataFrame,
        target: LinrefFrame,
        source: LinrefFrame,
        axis: int = 1,
    ):
        self.pairs = pairs
        self.target = target
        self.source = source
        self.axis = axis

    @property
    def T(self) -> "LinrefRelation":
        return LinrefRelation(
            self.pairs, self.target, self.source, axis=1 - self.axis
        )

    def cache(self) -> "LinrefRelation":
        """Relation cache (COVERAGE.md §2.4) — reuse the pair table across
        several aggregations without recomputing the join."""
        return LinrefRelation(
            self.pairs.persist(), self.target, self.source, self.axis
        )

    def _tgt(self) -> LinrefFrame:
        return self.target if self.axis == 1 else self.source

    def _src(self) -> LinrefFrame:
        return self.source if self.axis == 1 else self.target

    def _wrap(self, df: DataFrame) -> LinrefFrame:
        return LinrefFrame(df, self._tgt().lrs)

    def count(self, out_col: str = "count") -> LinrefFrame:
        return self._wrap(
            _agg.agg_count(self.pairs, self._tgt().df, self.axis, out_col)
        )

    def sum(self, value_col: str, conserve: bool = False,
            out_col: Optional[str] = None) -> LinrefFrame:
        return self._wrap(
            _agg.agg_sum(self.pairs, self._tgt().df, self._src().df, value_col,
                         self.axis, conserve, out_col)
        )

    def mean(self, value_col: str, out_col: Optional[str] = None) -> LinrefFrame:
        return self._wrap(
            _agg.agg_mean(self.pairs, self._tgt().df, self._src().df, value_col,
                          self.axis, out_col)
        )

    def mode(self, value_col: str, out_col: Optional[str] = None) -> LinrefFrame:
        return self._wrap(
            _agg.agg_mode(self.pairs, self._tgt().df, self._src().df, value_col,
                          self.axis, out_col)
        )

    def first(self, value_col: str, out_col: Optional[str] = None) -> LinrefFrame:
        return self._wrap(
            _agg.agg_first(self.pairs, self._tgt().df, self._src().df, value_col,
                           self.axis, out_col)
        )

    def last(self, value_col: str, out_col: Optional[str] = None) -> LinrefFrame:
        return self._wrap(
            _agg.agg_last(self.pairs, self._tgt().df, self._src().df, value_col,
                          self.axis, out_col)
        )

    def list(self, value_col: str, out_col: Optional[str] = None) -> LinrefFrame:
        return self._wrap(
            _agg.agg_list(self.pairs, self._tgt().df, self._src().df, value_col,
                          self.axis, out_col)
        )

    def set(self, value_col: str, out_col: Optional[str] = None) -> LinrefFrame:
        return self._wrap(
            _agg.agg_set(self.pairs, self._tgt().df, self._src().df, value_col,
                         self.axis, out_col)
        )

    def value_counts(self, value_col: str) -> LinrefFrame:
        return self._wrap(
            _agg.agg_value_counts(self.pairs, self._tgt().df, self._src().df,
                                  value_col, self.axis)
        )

    def distribute(
        self,
        value_col: Optional[str] = None,
        decay_size: int = 0,
        decay_func: Union[str, Callable[[Column], Column]] = "linear",
        **kw,
    ) -> LinrefFrame:
        return self._wrap(
            _distribute(
                self.pairs, self._tgt().df, self._src().df,
                self._tgt().lrs, self._src().lrs, value_col,
                decay_size=decay_size, decay_func=decay_func, **kw,
            )
        )
