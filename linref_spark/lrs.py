"""LRS schema binding for Spark event DataFrames.

A from-scratch PySpark re-expression of linref's schema layer:

- ``LRS`` mirrors the role-declaration object at
  ``/root/reference/linref/ext/lrs.py:9-62`` (key/loc/beg/end column names and
  interval closure), but is a plain dataclass carried *alongside* a
  ``pyspark.sql.DataFrame`` rather than stashed in ``DataFrame.attrs``.
- Closure vocabulary matches ``/root/reference/linref/events/common.py:9``
  (``{'left','left_mod','right','right_mod','both','neither'}``, default
  ``'right'`` per ``common.py:4``).
- Events are "point" (a ``loc`` measure), "linear" (``beg``/``end``), or both
  ("located linear"), per the shape validation at
  ``/root/reference/linref/events/base.py:321-406``.

Spark-first notes
-----------------
The canonical event frame used by every operator in this package is an
ordinary DataFrame with:

- ``event_id`` : long — deterministic, unique row id. At test scale this is a
  ``row_number`` over a caller-chosen canonical sort; at 100 TB scale callers
  should derive it from a natural key (never ``monotonically_increasing_id``,
  which is not stable across retries / re-partitioning).
- group (route) key columns — any equi-joinable columns; multi-column keys
  stay as multiple columns (Catalyst handles composite join keys natively,
  no record-array packing like ``linref/ext/base.py:749``).
- ``loc`` / ``beg`` / ``end`` : double measures.

Operators are pure ``DataFrame -> DataFrame`` functions parameterized by an
``LRS`` instance; nothing is registered engine-side, so plans stay fully
visible to Catalyst (predicate pushdown / column pruning work untouched).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Sequence

from pyspark.sql import DataFrame

CLOSED_ALL = frozenset(
    {"left", "left_mod", "right", "right_mod", "both", "neither"}
)
CLOSED_BASE = frozenset({"left", "right", "both", "neither"})
DEFAULT_CLOSED = "right"

EVENT_ID = "event_id"

GEOMETRY_SYNC_ALL = frozenset({"none", "ignore", "warn", "error", "drop"})
DEFAULT_GEOMETRY_SYNC = "drop"  # linref/options.py:50


class GeometrySyncError(RuntimeError):
    """A measure-editing operator would de-synchronize the geometry column
    (``linref/errors.py`` analogue)."""


class GeometrySyncWarning(UserWarning):
    """A measure-editing operator may de-synchronize the geometry column."""


def apply_geometry_sync(
    df: DataFrame, lrs: "LRS", method_name: str, geometry_sync: Optional[str] = None
) -> DataFrame:
    """{none,warn,error,drop} handling when an operator edits measures
    without re-cutting geometry — ``_method_deprecates_geometry``
    (``/root/reference/linref/ext/validation.py:9-49``). No-op on
    non-spatial frames. ``geometry_sync`` overrides ``lrs.geometry_sync``
    per call, like the reference's kwarg pop."""
    mode = geometry_sync if geometry_sync is not None else lrs.geometry_sync
    if mode not in GEOMETRY_SYNC_ALL:
        raise ValueError(
            f"Invalid geometry_sync {mode!r}; must be one of "
            f"{sorted(GEOMETRY_SYNC_ALL)}."
        )
    col = lrs.geom_m_col
    if col is None or col not in df.columns:
        return df
    if mode == "error":
        raise GeometrySyncError(
            f"The `{method_name}` operator may de-synchronize the geometry "
            f"column {col!r} with event measures. Set geometry_sync to "
            "'warn', 'none', or 'drop' to proceed."
        )
    if mode == "warn":
        import warnings

        warnings.warn(
            f"The `{method_name}` operator may de-synchronize the geometry "
            f"column {col!r} with event measures.",
            GeometrySyncWarning,
            stacklevel=3,
        )
        return df
    if mode in ("none", "ignore"):
        return df
    return df.drop(col)


def closed_base(closed: str) -> str:
    """Strip the ``_mod`` suffix: ``left_mod -> left``, ``right_mod -> right``.

    Mirrors ``EventsData.closed_base`` semantics used by the intersect kernels
    (``/root/reference/linref/events/relate.py:2161-2180``).
    """
    validate_closed(closed)
    return closed[:-4] if closed.endswith("_mod") else closed


def closed_mod(closed: str) -> bool:
    """True when the closure is one of the ``_mod`` variants."""
    validate_closed(closed)
    return closed.endswith("_mod")


def validate_closed(closed: str) -> None:
    if closed not in CLOSED_ALL:
        raise ValueError(
            f"Invalid closure {closed!r}; must be one of {sorted(CLOSED_ALL)}."
        )


@dataclass(frozen=True)
class LRS:
    """Column-role declaration for an event DataFrame.

    Parameters mirror ``linref.ext.lrs.LRS`` (``/root/reference/linref/ext/
    lrs.py:9-62``): ``key_cols`` identify the route/group, ``loc_col`` a point
    measure, ``beg_col``/``end_col`` an interval, ``closed`` the interval
    closure, ``geom_m_col`` an M-enabled polyline column
    (``array<struct<x,y,m>>``, see :mod:`linref_spark.geometry`).
    """

    key_cols: Sequence[str] = field(default_factory=tuple)
    loc_col: Optional[str] = None
    beg_col: Optional[str] = None
    end_col: Optional[str] = None
    geom_m_col: Optional[str] = None
    closed: str = DEFAULT_CLOSED
    # behavior when a measure edit would de-sync geom_m_col (linref
    # options.default_geometry_sync): none | warn | error | drop
    geometry_sync: str = DEFAULT_GEOMETRY_SYNC

    def __post_init__(self):
        validate_closed(self.closed)
        if self.geometry_sync not in GEOMETRY_SYNC_ALL:
            raise ValueError(
                f"Invalid geometry_sync {self.geometry_sync!r}; must be one "
                f"of {sorted(GEOMETRY_SYNC_ALL)}."
            )
        object.__setattr__(self, "key_cols", tuple(self.key_cols))
        if self.is_linear and (self.beg_col is None or self.end_col is None):
            raise ValueError("beg_col and end_col must be set together.")
        if not self.is_linear and not self.is_point:
            raise ValueError("LRS must declare loc_col and/or beg_col+end_col.")

    # -- shape predicates (cf. linref/events/base.py:341-371) ---------------
    @property
    def is_point(self) -> bool:
        return self.loc_col is not None and self.beg_col is None

    @property
    def is_located(self) -> bool:
        return self.loc_col is not None

    @property
    def is_linear(self) -> bool:
        return self.beg_col is not None or self.end_col is not None

    @property
    def is_grouped(self) -> bool:
        return len(self.key_cols) > 0

    @property
    def closed_base(self) -> str:
        return closed_base(self.closed)

    @property
    def closed_mod(self) -> bool:
        return closed_mod(self.closed)

    # -- helpers -------------------------------------------------------------
    def with_closed(self, closed: str) -> "LRS":
        return replace(self, closed=closed)

    def measure_cols(self) -> list[str]:
        cols = []
        if self.loc_col:
            cols.append(self.loc_col)
        if self.beg_col:
            cols.extend([self.beg_col, self.end_col])
        return cols

    def study(self, df: DataFrame) -> dict[str, bool]:
        """Report which declared roles are present in ``df``.

        Spark analogue of ``LRS.study`` (``linref/ext/lrs.py:285-328``).
        """
        present = set(df.columns)
        report = {f"key:{k}": k in present for k in self.key_cols}
        for role, col in (
            ("loc", self.loc_col),
            ("beg", self.beg_col),
            ("end", self.end_col),
            ("geom_m", self.geom_m_col),
        ):
            if col is not None:
                report[role] = col in present
        return report

    def validate_frame(self, df: DataFrame) -> None:
        missing = [
            c
            for c in (*self.key_cols, *(self.measure_cols() or []))
            if c not in df.columns
        ]
        if missing:
            raise ValueError(f"Event frame missing LRS columns: {missing}")

    def check_compatibility(self, other: "LRS") -> None:
        """Relation-compatibility check, cf. ``linref/ext/base.py:654-692``:
        both frames must be grouped identically (same number of key columns).
        """
        if self.is_grouped != other.is_grouped:
            raise ValueError("Both event frames must have the same grouping status.")
        if len(self.key_cols) != len(other.key_cols):
            raise ValueError(
                "Both event frames must use the same number of key columns."
            )
