"""Profile parity tests.

Goldens from ``/root/reference/linref/tests/test_events_profile.py``:
integral identities (:66-100) and overlay integration (:234-331).
"""

from __future__ import annotations

import numpy as np
import pytest

from linref_spark.relate.join import overlay_pairs
from linref_spark.relate.profile import (
    parabolic_antideriv,
    resolve_profile,
    trapezoidal_antideriv,
    triangular_antideriv,
    uniform_antideriv,
)
from tests.conftest import make_events, pairs_to_matrix


def eval_integral(spark, antideriv, a, b):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(float(a), float(b))], ["a", "b"])
    return df.select(
        (antideriv(F.col("b")) - antideriv(F.col("a"))).alias("v")
    ).first()["v"]


@pytest.mark.parametrize(
    "anti",
    [uniform_antideriv, triangular_antideriv, parabolic_antideriv,
     trapezoidal_antideriv(0.25), trapezoidal_antideriv(0.5)],
)
def test_integral_identities(spark, anti):
    # full integral over [0,1] is 1; symmetric halves each 0.5
    assert eval_integral(spark, anti, 0.0, 1.0) == pytest.approx(1.0)
    assert eval_integral(spark, anti, 0.0, 0.5) == pytest.approx(
        eval_integral(spark, anti, 0.5, 1.0)
    )


@pytest.fixture(scope="module")
def profile_fixture(spark):
    left, llrs = make_events(spark, begs=[0, 5, 15], ends=[10, 15, 25])
    right, rlrs = make_events(spark, begs=[0, 10], ends=[10, 20])
    return left, llrs, right, rlrs


def test_uniform_equals_standard(spark, profile_fixture):
    left, llrs, right, rlrs = profile_fixture
    std = pairs_to_matrix(
        overlay_pairs(left, right, llrs, rlrs, normalize=True, norm_by="right"),
        3, 2, weight=True,
    )
    uni = pairs_to_matrix(
        overlay_pairs(left, right, llrs, rlrs, normalize=True, norm_by="right",
                      profile="uniform"),
        3, 2, weight=True,
    )
    assert np.allclose(std, uni, atol=1e-12)


@pytest.mark.parametrize("profile", [None, "triangular", "parabolic", "trapezoidal"])
def test_full_overlap_equals_one(spark, profile):
    left, llrs = make_events(spark, begs=[0.0], ends=[10.0])
    right, rlrs = make_events(spark, begs=[0.0], ends=[10.0])
    mat = pairs_to_matrix(
        overlay_pairs(left, right, llrs, rlrs, normalize=True, norm_by="right",
                      profile=profile),
        1, 1, weight=True,
    )
    assert mat[0, 0] == pytest.approx(1.0)


def test_symmetric_halves_sum_to_one(spark, profile_fixture):
    left, llrs, right, rlrs = profile_fixture
    mat = pairs_to_matrix(
        overlay_pairs(left, right, llrs, rlrs, normalize=True, norm_by="right",
                      profile="triangular"),
        3, 2, weight=True,
    )
    assert mat[:, 1].sum() == pytest.approx(1.0)
    assert mat[1, 1] == pytest.approx(0.5)
    assert mat[2, 1] == pytest.approx(0.5)
    # no-overlap cell is zero (dropped from the pair table)
    assert mat[2, 0] == 0.0


def test_profile_grouped(spark):
    left, llrs = make_events(spark, begs=[0, 0], ends=[10, 10], groups=[1, 2])
    right, rlrs = make_events(spark, begs=[0, 0], ends=[10, 10], groups=[1, 2])
    mat = pairs_to_matrix(
        overlay_pairs(left, right, llrs, rlrs, normalize=True, norm_by="right",
                      profile="parabolic"),
        2, 2, weight=True,
    )
    assert np.allclose(np.diag(mat), [1.0, 1.0], atol=1e-12)
    assert mat[0, 1] == 0.0 and mat[1, 0] == 0.0


def test_profile_norm_by_left(spark, profile_fixture):
    left, llrs, right, rlrs = profile_fixture
    mat = pairs_to_matrix(
        overlay_pairs(left, right, llrs, rlrs, normalize=True, norm_by="left",
                      profile="triangular"),
        3, 2, weight=True,
    )
    assert mat[0, 0] == pytest.approx(1.0)


def test_profile_sum_mean_identity(spark):
    # identical frames: profiled weights are 1 on the diagonal, so sum()
    # returns the data and mean() returns the data (profile.py:312-331)
    from linref_spark.relate import agg as A
    from tests.conftest import col_as_array

    left, llrs = make_events(spark, begs=[0, 10, 20], ends=[10, 20, 30])
    right, rlrs = make_events(
        spark, begs=[0, 10, 20], ends=[10, 20, 30],
        extra={"val": [1.0, 2.0, 3.0], "four": [4.0, 4.0, 4.0]},
    )
    pairs = overlay_pairs(
        left, right, llrs, rlrs, normalize=True, norm_by="right",
        profile="triangular",
    )
    s = col_as_array(A.agg_sum(pairs, left, right, "val", out_col="s"), "s", 3)
    assert [float(v) for v in s] == pytest.approx([1.0, 2.0, 3.0])
    pairs_p = overlay_pairs(
        left, right, llrs, rlrs, normalize=True, norm_by="right",
        profile="parabolic",
    )
    m = col_as_array(A.agg_mean(pairs_p, left, right, "four", out_col="m"), "m", 3)
    assert [float(v) for v in m] == pytest.approx([4.0, 4.0, 4.0])


def test_custom_profile_callable(spark):
    # extension surface: a custom Column->Column antiderivative
    anti = resolve_profile(lambda t: t * t)  # f(t)=2t, integral over [0,1]=1
    left, llrs = make_events(spark, begs=[0.0], ends=[10.0])
    right, rlrs = make_events(spark, begs=[0.0], ends=[10.0])
    mat = pairs_to_matrix(
        overlay_pairs(left, right, llrs, rlrs, normalize=True, norm_by="right",
                      profile=anti),
        1, 1, weight=True,
    )
    assert mat[0, 0] == pytest.approx(1.0)
