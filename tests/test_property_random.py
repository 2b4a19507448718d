"""Randomized property tests: Spark operators vs an independent numpy
mirror of the reference semantics.

The mirror re-derives the intersect/overlay rules directly from
``/root/reference/linref/events/relate.py`` (closure edge table, modified
edges, overlap formula) in plain numpy — an implementation independent of
the Spark code paths, so agreement over seeded random inputs is strong
evidence both read the semantics the same way. 200 intervals x 6 closures
x 2 strategies per run, one Spark job per comparison.
"""

from __future__ import annotations

import numpy as np
import pytest

from linref_spark.relate.join import EQUI, JoinStrategy, intersect_pairs, overlay_pairs
from tests.conftest import make_events, pairs_to_matrix

BINNED = JoinStrategy("binned", bin_size=9.0)
SALTED = JoinStrategy("binned", bin_size=9.0, salt_buckets=4)
CLOSURES = ["left", "right", "both", "neither", "left_mod", "right_mod"]


def np_modified_edges(begs, ends, groups, closed):
    """Mirror of base.py:255-283 over sort_standard order within groups."""
    n = len(begs)
    edges = np.zeros(n, dtype=bool)
    if not closed.endswith("_mod"):
        return edges, np.arange(n)
    order = np.lexsort((ends, begs, groups))
    b, e, g = begs[order], ends[order], groups[order]
    res = np.zeros(n, dtype=bool)
    if n > 1:
        overlapping = (g[1:] == g[:-1]) & (b[1:] <= e[:-1])
        if closed == "left_mod":
            res = np.append(~overlapping, True)
        else:
            res = np.append(True, ~overlapping)
        # group boundaries: last/first of each group are terminal
        if closed == "left_mod":
            res[:-1] |= g[1:] != g[:-1]
        else:
            res[1:] |= g[1:] != g[:-1]
    else:
        res = np.array([True])
    out = np.zeros(n, dtype=bool)
    out[order] = res
    return out, order


def np_intersect_ll(lb, le, lg, lmod, lc, rb, re, rg, rmod, rc):
    """Mirror of relate.py:2192-2273."""
    res = (le[:, None] > rb[None, :]) & (lb[:, None] < re[None, :])
    test_edges = not (
        lc == "neither" or rc == "neither"
        or (lc == "left" and rc == "left")
        or (lc == "right" and rc == "right")
    )
    if test_edges:
        if lc != "right" and rc != "left":
            e1 = lb[:, None] == re[None, :]
            if lc == "right_mod":
                e1 &= lmod[:, None]
            if rc == "left_mod":
                e1 &= rmod[None, :]
            res |= e1
        if lc != "left" and rc != "right":
            e2 = le[:, None] == rb[None, :]
            if lc == "left_mod":
                e2 &= lmod[:, None]
            if rc == "right_mod":
                e2 &= rmod[None, :]
            res |= e2
    res &= lg[:, None] == rg[None, :]
    return res


def random_fixture(rng, n, n_groups):
    begs = np.round(rng.uniform(0, 60, n), 1)
    lens = np.round(rng.choice([0.0, 0.1, 2.0, 5.0, 10.0], n), 1)
    ends = begs + lens
    groups = rng.integers(0, n_groups, n)
    # inject exact-touch chains to stress edge predicates
    for i in range(0, n - 1, 7):
        begs[i + 1] = ends[i]
        ends[i + 1] = begs[i + 1] + lens[i + 1]
        groups[i + 1] = groups[i]
    return begs, ends, groups


@pytest.mark.parametrize("closed", CLOSURES)
@pytest.mark.parametrize("seed", [7, 42])
def test_intersect_matches_numpy_mirror(spark, closed, seed):
    rng = np.random.default_rng(seed)
    lb, le, lg = random_fixture(rng, 60, 4)
    rb, re, rg = random_fixture(rng, 50, 4)
    left, llrs = make_events(spark, begs=lb, ends=le, groups=[int(g) for g in lg], closed=closed)
    right, rlrs = make_events(spark, begs=rb, ends=re, groups=[int(g) for g in rg], closed=closed)

    lmod, _ = np_modified_edges(lb, le, lg, closed)
    rmod, _ = np_modified_edges(rb, re, rg, closed)
    expected = np_intersect_ll(lb, le, lg, lmod, closed, rb, re, rg, rmod, closed)

    for strat in (EQUI, BINNED, SALTED):
        got = pairs_to_matrix(
            intersect_pairs(left, right, llrs, rlrs, strategy=strat), 60, 50
        )
        mism = np.argwhere(got != expected)
        assert mism.size == 0, (
            f"{closed}/{strat.kind}: first mismatch {mism[:3]}"
        )


@pytest.mark.parametrize("seed", [3, 11])
def test_overlay_matches_numpy_mirror(spark, seed):
    rng = np.random.default_rng(seed)
    lb, le, lg = random_fixture(rng, 60, 4)
    rb, re, rg = random_fixture(rng, 50, 4)
    left, llrs = make_events(spark, begs=lb, ends=le, groups=[int(g) for g in lg])
    right, rlrs = make_events(spark, begs=rb, ends=re, groups=[int(g) for g in rg])

    # mirror of relate.py:2014-2030 + right-normalization
    overlap = np.minimum(le[:, None] - rb[None, :], re[None, :] - lb[:, None])
    overlap = np.minimum(overlap, np.minimum((le - lb)[:, None], (re - rb)[None, :]))
    overlap = np.clip(overlap, 0, None)
    overlap = overlap * (lg[:, None] == rg[None, :])
    denom = np.where((re - rb) == 0, np.inf, (re - rb))[None, :]
    expected = overlap / denom

    for strat in (EQUI, BINNED, SALTED):
        got = pairs_to_matrix(
            overlay_pairs(left, right, llrs, rlrs, norm_by="right", strategy=strat),
            60, 50, weight=True,
        )
        assert np.allclose(got, expected, atol=1e-12)


def test_salted_binned_on_identical_interval_flood(spark):
    """Degenerate skew: many IDENTICAL [beg, end] intervals share one
    (route, bin) key, where binning stops spreading. salt_buckets must
    leave results identical to equi while splitting the hot key."""
    import pytest as _pytest

    n = 800
    lb = np.array([10.0] * n)           # one flooded bin
    le = np.array([12.0] * n)
    lg = np.zeros(n, dtype=int)
    rb = np.round(np.linspace(0.0, 20.0, 40), 1)
    re = rb + 3.0
    rg = np.zeros(40, dtype=int)
    left, llrs = make_events(spark, begs=lb, ends=le, groups=[0] * n)
    right, rlrs = make_events(spark, begs=rb, ends=re, groups=[0] * 40)

    base = intersect_pairs(left, right, llrs, rlrs, strategy=EQUI)
    want = {(r["left_id"], r["right_id"]) for r in base.collect()}
    salted = intersect_pairs(
        left, right, llrs, rlrs,
        strategy=JoinStrategy("binned", bin_size=5.0, salt_buckets=8),
    )
    got = {(r["left_id"], r["right_id"]) for r in salted.collect()}
    assert got == want and len(want) > 0

    with _pytest.raises(ValueError, match="binned"):
        JoinStrategy("equi", salt_buckets=4)
    with _pytest.raises(ValueError, match=">= 2"):
        JoinStrategy("binned", bin_size=5.0, salt_buckets=1)
