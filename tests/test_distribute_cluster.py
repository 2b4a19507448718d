"""Parity tests for distribute (sliding-window smoothing) and cluster.

Goldens from ``/root/reference/linref/tests/test_events_relate.py:1005-1175``
and the HIN-workflow conservation invariant
(``/root/reference/linref/tests/test_integration.py:333-369``).
"""

from __future__ import annotations

import pytest

from linref_spark.relate.distribute import distribute, make_decay
from linref_spark.relate.join import intersect_pairs, overlay_pairs
from linref_spark.spatial.cluster import cluster
from tests.conftest import col_as_array, make_events


@pytest.fixture(scope="module")
def dist_fixture(spark):
    left, llrs = make_events(
        spark, begs=[0, 10, 20, 30, 40], ends=[10, 20, 30, 40, 50]
    )
    right, rlrs = make_events(spark, begs=[15], ends=[25], extra={"val": [1.0]})
    opairs = overlay_pairs(left, right, llrs, rlrs, normalize=True, norm_by="right")
    return left, llrs, right, rlrs, opairs.cache()


def _run(dist_fixture, **kw):
    left, llrs, right, rlrs, opairs = dist_fixture
    out = distribute(
        opairs, left, right, llrs, rlrs, value_col="val", axis=1, **kw
    )
    return [float(v) for v in col_as_array(out, "distributed", 5)]


def test_distribute_no_decay(dist_fixture):
    res = _run(dist_fixture, decay_size=0)
    assert res[1] > 0 and res[2] > 0
    assert res[0] == 0 and res[3] == 0 and res[4] == 0
    assert sum(res) == pytest.approx(1.0)


def test_distribute_linear_decay_conserves(dist_fixture):
    res = _run(dist_fixture, decay_size=2, decay_func="linear", direction="both")
    assert sum(res) == pytest.approx(1.0)
    assert all(v > 0 for v in res)  # spread reaches all 5 rows


def test_distribute_forward_backward(dist_fixture):
    fwd = _run(dist_fixture, decay_size=1, decay_func="flat", direction="forward")
    bwd = _run(dist_fixture, decay_size=1, decay_func="flat", direction="backward")
    assert sum(fwd) == pytest.approx(1.0)
    assert sum(bwd) == pytest.approx(1.0)
    # forward spreads toward earlier rows (relate.py:1470-1472); matches sit
    # at rows 1,2 so size-1 spread reaches row 0 (forward) / row 3 (backward)
    assert fwd[0] > 0 and fwd[3] == 0 and fwd[4] == 0
    assert bwd[3] > 0 and bwd[0] == 0 and bwd[4] == 0


def test_distribute_exact_linear_decay_values(dist_fixture):
    # hand-executed reference math: matches w=0.5 at rows 1 and 2;
    # decay(1)=1/2 for size=1; length 10 everywhere cancels in normalization.
    # contributions: row0: .5*.5 ; row1: .5 + .5*.5 ; row2: .5 + .5*.5 ;
    # row3: .5*.5 ; total 2.0 -> normalized shares [.125, .375, .375, .125, 0]
    res = _run(dist_fixture, decay_size=1, decay_func="linear", direction="both")
    assert res == [
        pytest.approx(0.125),
        pytest.approx(0.375),
        pytest.approx(0.375),
        pytest.approx(0.125),
        pytest.approx(0.0),
    ]


def test_distribute_group_masking(spark):
    left, llrs = make_events(
        spark, begs=[0, 10, 0, 10], ends=[10, 20, 10, 20], groups=["A", "A", "B", "B"]
    )
    right, rlrs = make_events(
        spark, begs=[5], ends=[15], groups=["A"], extra={"val": [1.0]}
    )
    op = overlay_pairs(left, right, llrs, rlrs)
    out = distribute(
        op, left, right, llrs, rlrs, value_col="val",
        decay_size=3, decay_func="flat",
    )
    res = [float(v) for v in col_as_array(out, "distributed", 4)]
    # rows 2,3 are group B: decay would reach them positionally but the
    # group mask zeroes those shares (relate.py:1480-1495)
    assert res[2] == 0.0 and res[3] == 0.0
    assert sum(res) == pytest.approx(1.0)


def test_distribute_rejects_noncontiguous_ids(spark):
    """A target filtered after add_event_id (gapped _pos) must raise a
    clear error instead of silently shifting neighbor positions — the
    window form moves by ROWS, the reference by a reset dense index."""
    left, llrs = make_events(
        spark, begs=[0, 10, 20, 30, 40], ends=[10, 20, 30, 40, 50]
    )
    right, rlrs = make_events(spark, begs=[15], ends=[25], extra={"val": [1.0]})
    gapped = left.where("event_id != 2")  # dense 0..4 -> 0,1,3,4
    op = overlay_pairs(gapped, right, llrs, rlrs)
    with pytest.raises(ValueError, match="contiguous"):
        distribute(
            op, gapped, right, llrs, rlrs, value_col="val", decay_size=1
        ).collect()

    # grouped variant: gap inside one route
    gleft, gllrs = make_events(
        spark, begs=[0, 10, 20, 0], ends=[10, 20, 30, 10],
        groups=["A", "A", "A", "B"],
    )
    gright, grlrs = make_events(
        spark, begs=[5], ends=[15], groups=["A"], extra={"val": [1.0]}
    )
    ggap = gleft.where("event_id != 1")
    gop = overlay_pairs(ggap, gright, gllrs, grlrs)
    with pytest.raises(ValueError, match="contiguous"):
        distribute(
            gop, ggap, gright, gllrs, grlrs, value_col="val", decay_size=1
        ).collect()


def test_distribute_hin_conservation(spark):
    # segments x crashes: every matched crash's unit value is fully
    # distributed -> sum == n matched crashes (test_integration.py:355-361)
    segs, slrs = make_events(
        spark,
        begs=[0, 5, 10, 0, 5], ends=[5, 10, 15, 5, 10],
        groups=["R1", "R1", "R1", "R2", "R2"],
    )
    crashes, clrs = make_events(
        spark,
        locs=[1.0, 4.9, 7.5, 12.0, 2.0, 9.9],
        groups=["R1", "R1", "R1", "R1", "R2", "R2"],
        extra={"one": [1.0] * 6},
    )
    ip = intersect_pairs(segs, crashes, slrs, clrs)
    out = distribute(
        ip, segs, crashes, slrs, clrs, value_col="one",
        decay_size=2, decay_func="linear",
    )
    res = [float(v) for v in col_as_array(out, "distributed", 5)]
    assert sum(res) == pytest.approx(6.0)


@pytest.mark.parametrize(
    "seed,decay_size,decay_func,direction,length_normalize",
    [
        (0, 10, "linear", "both", True),      # decay window > route length
        (1, 3, "gaussian", "forward", True),
        (2, 5, "exponential", "backward", True),
        (3, 2, "flat", "both", False),
    ],
)
def test_distribute_conservation_randomized(
    spark, seed, decay_size, decay_func, direction, length_normalize
):
    """Randomized conservation gate for the separated-form rewrite: 100
    independent random route groups per configuration (group masking makes
    them independent scenarios in ONE job), with adversarial shapes —
    zero-length targets, negative-measure routes, decay windows wider than
    the route. Every source's value must be fully distributed: sum(out)
    == sum(in) globally AND per group (relate.py:1501-1520 semantics)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    t_begs, t_ends, t_groups = [], [], []
    s_locs, s_groups, s_vals = [], [], []
    for g in range(100):
        route = f"G{g:03d}"
        n_rows = int(rng.randint(1, 9))
        start = float(rng.randint(-50, 50))  # negative measures allowed
        pos = start
        spans = []
        for _ in range(n_rows):
            ln = float(rng.choice([0.0, 0.0, 1.0, 2.5, 7.0]))  # zero-len mix
            spans.append((pos, pos + ln))
            pos += ln
        # guarantee at least one positive-length target to anchor sources
        if all(b == e for b, e in spans):
            spans[-1] = (spans[-1][0], spans[-1][0] + 3.0)
        for b, e in spans:
            t_begs.append(b)
            t_ends.append(e)
            t_groups.append(route)
        positive = [(b, e) for b, e in spans if e > b]
        for _ in range(int(rng.randint(1, 5))):
            b, e = positive[rng.randint(len(positive))]
            frac = float(rng.uniform(0.1, 0.9))
            s_locs.append(b + frac * (e - b))  # strictly interior
            s_groups.append(route)
            s_vals.append(float(rng.uniform(0.5, 10.0)))

    targets, tlrs = make_events(spark, begs=t_begs, ends=t_ends, groups=t_groups)
    sources, slrs = make_events(
        spark, locs=s_locs, groups=s_groups, extra={"val": s_vals}
    )
    ip = intersect_pairs(targets, sources, tlrs, slrs)
    out = distribute(
        ip, targets, sources, tlrs, slrs, value_col="val",
        decay_size=decay_size, decay_func=decay_func, direction=direction,
        length_normalize=length_normalize,
    )
    from pyspark.sql import functions as F

    got = {
        r.route: r.s
        for r in out.groupBy("route").agg(F.sum("distributed").alias("s")).collect()
    }
    want: dict = {}
    for route, v in zip(s_groups, s_vals):
        want[route] = want.get(route, 0.0) + v
    assert set(got) == set(t_groups)
    for route in want:
        assert got[route] == pytest.approx(want[route], rel=1e-9), route
    assert sum(got.values()) == pytest.approx(sum(s_vals), rel=1e-9)


def test_decay_functions():
    lin = make_decay("linear", 2)
    assert lin(0) == 1.0 and lin(1) == pytest.approx(1 - 1 / 3)
    exp = make_decay("exponential", 4)
    assert exp(0) == 1.0 and exp(5) == pytest.approx(pytest.approx(2.718281828**-5))
    gauss = make_decay("gaussian", 3)
    assert gauss(0) == 1.0 and gauss(3) == pytest.approx(0.011108996538242306)
    flat = make_decay("flat", 9)
    assert flat(7) == 1.0
    zero = make_decay("linear", 0)
    assert zero(5) == 1.0  # decay_size=0 short-circuits


# --- cluster -----------------------------------------------------------------


def test_cluster_points(spark):
    df, lrs = make_events(
        spark, locs=[0.0, 1.0, 2.0, 10.0, 11.0, 50.0],
        groups=["A"] * 6,
    )
    out = cluster(df, lrs, max_gap=1.0)
    labels = list(col_as_array(out, "cluster", 6))
    # 0,1,2 chain together (gaps 1.0 -> buffered ranges overlap strictly? no:
    # ranges touch at edges only when gap == 2*max_gap; here gap 1 < 2 -> yes)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] != labels[0]
    assert labels[5] not in (labels[0], labels[3])
    assert labels[0] == 0 and labels[3] == 1 and labels[5] == 2  # first-visit order


def test_cluster_groups_and_links(spark):
    df, lrs = make_events(
        spark, locs=[0.0, 0.5, 0.0, 0.5],
        groups=["A", "A", "B", "B"],
        extra={"node": [None, "X", "X", None]},
    )
    no_link = cluster(df, lrs, max_gap=1.0)
    nl = list(col_as_array(no_link, "cluster", 4))
    assert nl[0] == nl[1] and nl[2] == nl[3] and nl[0] != nl[2]
    linked = cluster(df, lrs, max_gap=1.0, link_cols=["node"])
    lk = list(col_as_array(linked, "cluster", 4))
    assert len(set(lk)) == 1  # link bridges the two routes


def test_cluster_transitive_chain(spark):
    # long chain exercises pointer-jumping convergence
    locs = [float(i) for i in range(30)]
    df, lrs = make_events(spark, locs=locs, groups=["A"] * 30)
    out = cluster(df, lrs, max_gap=0.6)
    labels = set(col_as_array(out, "cluster", 30))
    assert labels == {0}


def test_distribute_rejects_duplicate_ids_that_cancel_a_gap(spark):
    """[0,1,1,3] passes the span==count precondition (the duplicate cancels
    the gap) — the in-plan adjacent-duplicate guard must still error at
    execution instead of silently misaligning the positional window."""
    left, llrs = make_events(
        spark, begs=[0, 10, 20, 30], ends=[10, 20, 30, 40],
        groups=["A"] * 4,
    )
    dup = left.withColumn(
        "event_id",
        # ids become [0, 1, 1, 3]
        left.event_id - (left.event_id == 2).cast("long"),
    )
    right, rlrs = make_events(
        spark, begs=[5], ends=[15], groups=["A"], extra={"val": [1.0]}
    )
    op = overlay_pairs(dup, right, llrs, rlrs)
    with pytest.raises(Exception, match="duplicate target event ids"):
        distribute(
            op, dup, right, llrs, rlrs, value_col="val", decay_size=1
        ).collect()


def test_distribute_ungrouped_across_bucket_boundaries(spark):
    """The ungrouped halo-window path replicates rows near bucket edges;
    with fewer than bucket-size (>=64) targets every prior test ran in a
    single bucket, leaving the halo logic uncovered. 200 contiguous
    targets (multiple buckets at any parts count) must match the exact
    per-position expectation of a middle-hit decay spread."""
    n = 200
    begs = [float(10 * i) for i in range(n)]
    ends = [b + 10.0 for b in begs]
    left, llrs = make_events(spark, begs=begs, ends=ends)
    # one source intersecting exactly one target near a bucket boundary
    # (event 63/64 edge at the floor bucket size) and one mid-frame
    right, rlrs = make_events(
        spark, begs=[635.0, 1001.0], ends=[638.0, 1004.0],
        extra={"val": [1.0, 1.0]},
    )
    ip = intersect_pairs(left, right, llrs, rlrs)
    out = distribute(
        ip, left, right, llrs, rlrs, value_col="val", decay_size=3,
        decay_func="linear", length_normalize=False,
    )
    got = [float(v) for v in col_as_array(out, "distributed", n)]
    # brute-force oracle: spread w*decay over q+/-s, normalize per source
    import math
    cap = 4.0
    dw = [1.0] + [1.0 - s / cap for s in range(1, 4)]
    exp = [0.0] * n
    for hit in (63, 100):
        shares = {}
        for s in range(-3, 4):
            q = hit + s
            if 0 <= q < n:
                shares[q] = dw[abs(s)]
        tot = sum(shares.values())
        for q, v in shares.items():
            exp[q] += v / tot
    assert got == pytest.approx(exp, abs=1e-12)
