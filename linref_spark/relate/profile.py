"""Event value profiles as closed-form Catalyst column expressions.

Re-expresses ``/root/reference/linref/events/profile.py:14-273`` — profiles
describe how an event's value is distributed over its normalized span
t in [0, 1]; overlay weighting only ever needs the *definite integral*
F(b) - F(a), so each profile here is just an antiderivative builder
``Column -> Column``. Pure JVM-side expressions: no UDF, fully inside
whole-stage codegen.

Built-ins and their antiderivatives (normalized so integral over [0,1] = 1):

- uniform      f(t)=1            F(t) = t                  (profile.py:103-104)
- triangular   f(t)=4t | 4(1-t)  F(t) = 2t^2 | -2t^2+4t-1  (profile.py:122-131)
- parabolic    f(t)=6t(1-t)      F(t) = 3t^2 - 2t^3        (profile.py:148-156)
- trapezoidal  ramp r            piecewise, scale 1/(1-r)  (profile.py:200-218)
"""

from __future__ import annotations

from typing import Callable, Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

Antideriv = Callable[[Column], Column]


def uniform_antideriv(t: Column) -> Column:
    return t


def triangular_antideriv(t: Column) -> Column:
    return F.when(t < 0.5, 2.0 * t * t).otherwise(-2.0 * t * t + 4.0 * t - 1.0)


def parabolic_antideriv(t: Column) -> Column:
    return 3.0 * t * t - 2.0 * t * t * t


def trapezoidal_antideriv(ramp: float = 0.25) -> Antideriv:
    if not (0 < ramp <= 0.5):
        raise ValueError(f"ramp must satisfy 0 < ramp <= 0.5, got {ramp}")
    s = 1.0 / (1.0 - ramp)
    r = ramp

    def _f(t: Column) -> Column:
        return (
            F.when(t < r, s * t * t / (2.0 * r))
            .when(t <= 1.0 - r, s * (t - r / 2.0))
            .otherwise(s * (1.0 - r - (1.0 - t) * (1.0 - t) / (2.0 * r)))
        )

    return _f


_REGISTRY: dict[str, Antideriv] = {
    "uniform": uniform_antideriv,
    "triangular": triangular_antideriv,
    "parabolic": parabolic_antideriv,
    "trapezoidal": trapezoidal_antideriv(0.25),
}


def resolve_profile(profile: Union[None, str, Antideriv]) -> Optional[Antideriv]:
    """None | registry name | custom ``Column -> Column`` antiderivative.

    Custom profiles (cf. the subclass hook at ``profile.py:14-87``) are plain
    Python callables building column expressions — they still compile to
    JVM-side exprs, keeping the extension surface UDF-free.
    """
    if profile is None:
        return None
    if callable(profile):
        return profile
    if isinstance(profile, str):
        key = profile.lower()
        if key not in _REGISTRY:
            raise ValueError(
                f"Unknown profile {profile!r}. Available: {sorted(_REGISTRY)}"
            )
        return _REGISTRY[key]
    raise TypeError("profile must be None, a name, or a Column->Column callable")


def profile_integral(antideriv: Antideriv, a: Column, b: Column) -> Column:
    return antideriv(b) - antideriv(a)
