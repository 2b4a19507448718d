"""Event analysis predicates: duplicated / find_same / find_inside.

From-scratch Spark window re-expressions of
``/root/reference/linref/events/analyze.py``. The reference loops groups in
Python and calls numpy uniqueness/cummax kernels per group; here each is a
single window pass partitioned by the route key (group loop == hash
partitioning, no driver iteration).

Scale note: on an UNGROUPED frame these windows degenerate to a single
partition (the data genuinely is one group — a running max over one
sequence is inherently sequential). Grouped frames, the 100 TB case,
distribute by key; keep frames keyed at scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linref_spark.lrs import EVENT_ID, LRS
from linref_spark.events.frame import centers_col, lengths_col

ANCHOR_EXPRS = {
    "begs": lambda lrs: F.col(lrs.beg_col),
    "ends": lambda lrs: F.col(lrs.end_col),
    "locs": lambda lrs: F.col(lrs.loc_col),
    "centers": lambda lrs: centers_col(lrs),
}


def _anchors(lrs: LRS) -> list[str]:
    """Valid anchors per event shape (``base.py:244-254``)."""
    a = []
    if lrs.is_linear:
        a.extend(["begs", "ends"])
    if lrs.is_located:
        a.append("locs")
    return a


def duplicated(
    df: DataFrame,
    lrs: LRS,
    subset: Optional[Sequence[str]] = None,
    keep: str = "first",
    out_col: str = "duplicated",
) -> DataFrame:
    """Mask of events duplicated over the selected anchors within a group
    (``analyze.py:4-87``). ``keep`` marks all-but-first / all-but-last / all
    duplicates. "first"/"last" are positions in original row order
    (numpy ``unique`` return_index -> smallest original index wins).
    """
    if keep not in ("first", "last", "none"):
        raise ValueError("keep must be 'first', 'last', or 'none'")
    anchors = list(subset) if subset is not None else _anchors(lrs)
    bad = [a for a in anchors if a not in _anchors(lrs)]
    if bad:
        raise ValueError(f"Invalid anchors {bad}; valid: {_anchors(lrs)}")
    parts = [F.col(k) for k in lrs.key_cols] + [
        ANCHOR_EXPRS[a](lrs) for a in anchors
    ]
    if keep == "none":
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*parts))
        return df.withColumn(out_col, cnt > 1)
    order = F.col(EVENT_ID).asc() if keep == "first" else F.col(EVENT_ID).desc()
    rn = F.row_number().over(Window.partitionBy(*parts).orderBy(order))
    return df.withColumn(out_col, rn > 1)


def find_same(
    df: DataFrame, lrs: LRS, keep: str = "first", out_col: str = "same"
) -> DataFrame:
    """Duplicate (beg, end) pairs within group (``analyze.py:89-114``)."""
    if not lrs.is_linear:
        raise ValueError("find_same requires linear events")
    return duplicated(df, lrs, subset=["begs", "ends"], keep=keep, out_col=out_col)


def find_inside(
    df: DataFrame, lrs: LRS, enforce_edges: bool = False, out_col: str = "inside"
) -> DataFrame:
    """Mask of events fully contained in another event of the same group
    (``analyze.py:116-193``). Algorithm ported from
    ``_find_inside_ungrouped``: sort by (beg asc, length desc), take the
    running max of ends (the dominating extent) and the beg of the first row
    that attained it; containment tests against that pair. Identical ranges
    are never "inside" each other (the dominator's own beg/end fail the
    strict half of each disjunct).

    One window pass per group — the running max is ``max(end) over rows
    unboundedPreceding..current``; the dominator's beg is ``min(beg) over
    partition (group, cummax)`` (equal cummax values are contiguous in this
    order, and the first row of the run set the max).
    """
    if not lrs.is_linear:
        raise ValueError("find_inside requires linear events")
    keys = [F.col(k) for k in lrs.key_cols]
    beg, end = F.col(lrs.beg_col), F.col(lrs.end_col)
    order = [beg.asc(), lengths_col(lrs).desc(), F.col(EVENT_ID).asc()]
    w_run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    df2 = df.withColumn("_cummax", F.max(end).over(w_run))
    w_dom = Window.partitionBy(*keys, F.col("_cummax"))
    df2 = df2.withColumn("_cummin", F.min(beg).over(w_dom))
    cmx, cmn = F.col("_cummax"), F.col("_cummin")
    if enforce_edges:
        inside = ((beg >= cmn) & (end < cmx)) | ((beg > cmn) & (end <= cmx))
    else:
        inside = (beg > cmn) & (end < cmx)
    return df2.withColumn(out_col, inside).drop("_cummax", "_cummin")
