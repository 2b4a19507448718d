"""Package-level options: default LRS + default geometry-sync behavior.

Spark re-expression of the reference's package options registry
(``/root/reference/linref/options.py:63-83``): users who work with one
route network all session set the column roles once and every subsequent
:func:`linref_spark.frame.wrap` call picks them up.

    import linref_spark as ls
    ls.set_default_lrs(key_cols=("route",), beg_col="beg", end_col="end")
    lf = ls.wrap(df)              # roles come from the registry
    lf2 = ls.wrap(other_df, loc_col="loc")  # explicit roles still win
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

from linref_spark.lrs import LRS

_VALID_GEOMETRY_SYNC = ("none", "warn", "error", "drop")


class _Options:
    """Mutable package options (reference ``linref/options.py:8-60``)."""

    def __init__(self):
        self.reset()

    @property
    def default_lrs(self) -> Optional[LRS]:
        return self._default_lrs

    @default_lrs.setter
    def default_lrs(self, value: Optional[LRS]) -> None:
        if value is not None and not isinstance(value, LRS):
            raise ValueError("default_lrs must be an LRS instance or None.")
        self._default_lrs = value

    @property
    def default_geometry_sync(self) -> str:
        return self._default_geometry_sync

    @default_geometry_sync.setter
    def default_geometry_sync(self, value: str) -> None:
        if value not in _VALID_GEOMETRY_SYNC:
            raise ValueError(
                f"Invalid geometry synchronization behavior {value!r}. "
                f"Must be one of {list(_VALID_GEOMETRY_SYNC)}."
            )
        self._default_geometry_sync = value

    def reset(self) -> None:
        """Reset all options to their defaults (no default LRS; sync='drop')."""
        self._default_lrs = None
        self._default_geometry_sync = "drop"

    def __repr__(self) -> str:
        return (
            "linref_spark.options\n"
            f"  default_lrs:           {self._default_lrs!r}\n"
            f"  default_geometry_sync: {self._default_geometry_sync!r}"
        )


options = _Options()


def set_default_lrs(lrs: Optional[LRS] = None, **kwargs) -> LRS:
    """Register the default LRS (reference ``options.py:63-83``). Pass an
    :class:`~linref_spark.lrs.LRS` or the constructor kwargs; returns the
    registered instance. ``wrap(df)`` with no role arguments uses it."""
    if lrs is None:
        kwargs.setdefault("key_cols", ())
        lrs = LRS(**kwargs)
    options.default_lrs = lrs
    return lrs


def get_default_lrs(**overrides) -> Optional[LRS]:
    """The registered default LRS with per-call field overrides applied,
    or None when no default is set."""
    base = options.default_lrs
    if base is None:
        return None
    return replace(base, **overrides) if overrides else base
