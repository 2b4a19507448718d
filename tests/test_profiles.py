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


@pytest.mark.parametrize("seed", [11, 12])
@pytest.mark.parametrize(
    "profile",
    ["uniform", "triangular", "parabolic", "trapezoidal", "custom"],
)
def test_profile_randomized_partition_identity(spark, seed, profile):
    """Randomized property gate (>= 100 scenarios per config, ONE job):
    each route carries one right event randomly partitioned by contiguous
    left pieces (with random overhang past both ends). Identities asserted
    against closed-form numpy antiderivatives
    (ref linref/events/profile.py:103-218):

    1. per-pair: weight == F(t1) - F(t0) on the clamped normalized span;
    2. per-right: the partition's weights sum to F(1) - F(0) == 1 exactly
       as for the uniform profile (the length identity).
    """
    from pyspark.sql import functions as F

    rng = np.random.RandomState(seed)

    def np_anti(name):
        if name == "uniform":
            return lambda t: t
        if name == "triangular":
            return lambda t: np.where(t < 0.5, 2 * t * t, -2 * t * t + 4 * t - 1)
        if name == "parabolic":
            return lambda t: 3 * t * t - 2 * t ** 3
        if name == "trapezoidal":
            r, s = 0.25, 1.0 / 0.75

            def f(t):
                return np.where(
                    t < r, s * t * t / (2 * r),
                    np.where(t <= 1 - r, s * (t - r / 2),
                             s * (1 - r - (1 - t) ** 2 / (2 * r))),
                )
            return f
        # custom: f(t) = 2t  ->  F(t) = t^2 (integrates to 1 on [0,1])
        return lambda t: t * t

    if profile == "custom":
        spark_profile = lambda t: t * t  # noqa: E731
    else:
        spark_profile = profile

    t_begs, t_ends, t_groups = [], [], []
    r_begs, r_ends, r_groups = [], [], []
    expected = {}  # (left event order index) -> exact numpy weight
    anti = np_anti(profile)
    li = 0
    for g in range(100):
        route = f"P{g:03d}"
        r0 = float(rng.uniform(-30, 30))
        rlen = float(rng.uniform(0.5, 40))
        r1 = r0 + rlen
        r_begs.append(r0)
        r_ends.append(r1)
        r_groups.append(route)
        # random partition of [r0, r1] into 1-6 contiguous pieces
        k = int(rng.randint(1, 7))
        cuts = np.sort(rng.uniform(0, 1, size=k - 1)) if k > 1 else np.array([])
        ts = np.concatenate([[0.0], cuts, [1.0]])
        # random overhang past both ends (clamped t keeps identities)
        lead = float(rng.choice([0.0, rng.uniform(0.1, 5.0)]))
        tail = float(rng.choice([0.0, rng.uniform(0.1, 5.0)]))
        for j in range(k):
            b = r0 + ts[j] * rlen - (lead if j == 0 else 0.0)
            e = r0 + ts[j + 1] * rlen + (tail if j == k - 1 else 0.0)
            t_begs.append(b)
            t_ends.append(e)
            t_groups.append(route)
            t0, t1 = ts[j], ts[j + 1]
            expected[li] = float(anti(np.float64(t1)) - anti(np.float64(t0)))
            li += 1

    left, llrs = make_events(spark, begs=t_begs, ends=t_ends, groups=t_groups)
    right, rlrs = make_events(spark, begs=r_begs, ends=r_ends, groups=r_groups)
    op = overlay_pairs(
        left, right, llrs, rlrs, normalize=True, norm_by="right",
        profile=spark_profile, keep_zeros=True,
    )
    rows = op.collect()
    # per-pair closed-form parity
    got = {r.left_id: r.weight for r in rows}
    assert len(got) == len(expected)
    for lid, w in got.items():
        assert w == pytest.approx(expected[lid], abs=1e-9), lid
    # per-right partition identity: sums to F(1)-F(0) = 1 = uniform total
    sums = {}
    for r in rows:
        sums[r.right_id] = sums.get(r.right_id, 0.0) + r.weight
    assert len(sums) == 100
    for rid, s in sums.items():
        assert s == pytest.approx(1.0, abs=1e-9), rid
