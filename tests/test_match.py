"""Hausdorff line-to-line matching tests (semantics per
``/root/reference/linref/ext/spatial.py:16-273``)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linref_spark.events.frame import add_event_id
from linref_spark.geometry import kernels as K
from linref_spark.geometry.udfs import add_geom_m
from linref_spark.lrs import LRS
from linref_spark.spatial.match import match_lines_hausdorff

TLRS = LRS(key_cols=("route",), beg_col="beg", end_col="end", closed="left_mod")


def test_hausdorff_kernel():
    a = (np.array([0.0, 10.0]), np.array([0.0, 0.0]))
    b = (np.array([0.0, 10.0]), np.array([1.0, 1.0]))
    assert K.hausdorff_distance(*a, *b) == pytest.approx(1.0)
    c = (np.array([0.0, 5.0, 10.0]), np.array([0.0, 3.0, 0.0]))
    assert K.hausdorff_distance(*a, *c) == pytest.approx(3.0)
    # densify doesn't lower the vertex bound here (symmetric V shape)
    assert K.hausdorff_distance(*a, *c, densify=0.1) == pytest.approx(3.0)


def test_densify():
    xs, ys = K.densify_polyline(np.array([0.0, 10.0]), np.array([0.0, 0.0]), 0.25)
    assert len(xs) == 5 and xs[1] == pytest.approx(2.5)


@pytest.fixture(scope="module")
def network(spark):
    rows = [
        ("A", 0.0, 10.0, [0.0, 10.0], [0.0, 0.0]),
        ("B", 0.0, 10.0, [0.0, 10.0], [5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, ["route", "beg", "end", "geom_xs", "geom_ys"])
    return add_geom_m(add_event_id(df, TLRS), TLRS).cache()


def test_match_lines_basic(spark, network):
    # projected line hugging route A between x=2..8, offset 0.2
    proj = spark.createDataFrame(
        [(0, {"xs": [2.0, 8.0], "ys": [0.2, 0.2], "ms": [0.0, 6.0]})],
        "event_id long, geom_m struct<xs:array<double>,ys:array<double>,ms:array<double>>",
    )
    out = match_lines_hausdorff(network, proj, TLRS, buffer=1.0, match=1)
    got = out.collect()
    assert len(got) == 1
    r = got[0]
    assert r.route == "A"
    assert r.hausdorff == pytest.approx(0.2)
    assert r.beg_m == pytest.approx(2.0) and r.end_m == pytest.approx(8.0)
    assert r.match_rank == 1


def test_match_lines_reversed_endpoints(spark, network):
    proj = spark.createDataFrame(
        [(0, {"xs": [8.0, 2.0], "ys": [0.1, 0.1], "ms": [0.0, 6.0]})],
        "event_id long, geom_m struct<xs:array<double>,ys:array<double>,ms:array<double>>",
    )
    r = match_lines_hausdorff(network, proj, TLRS, buffer=1.0).first()
    assert r.beg_m == pytest.approx(2.0) and r.end_m == pytest.approx(8.0)


def test_match_lines_max_distance_filters(spark, network):
    # line midway between A (y=0) and B (y=5) but nearer A
    proj = spark.createDataFrame(
        [(0, {"xs": [2.0, 8.0], "ys": [2.0, 2.0], "ms": [0.0, 6.0]})],
        "event_id long, geom_m struct<xs:array<double>,ys:array<double>,ms:array<double>>",
    )
    none = match_lines_hausdorff(network, proj, TLRS, buffer=3.5, max_distance=1.0)
    assert none.count() == 0
    both = match_lines_hausdorff(network, proj, TLRS, buffer=3.5, match=0)
    rows = {r.route: r for r in both.collect()}
    assert rows["A"].match_rank == 1 and rows["A"].hausdorff == pytest.approx(2.0)
    assert rows["B"].match_rank == 2 and rows["B"].hausdorff == pytest.approx(3.0)


# --- ParallelProjector sample-point variant (ext/spatial.py:276-559) ----------


def test_parallel_project_samples_basic(spark, network):
    from linref_spark.spatial.match import parallel_project_samples

    proj = spark.createDataFrame(
        [(0, {"xs": [2.0, 8.0], "ys": [0.2, 0.2], "ms": [0.0, 6.0]})],
        "event_id long, geom_m struct<xs:array<double>,ys:array<double>,ms:array<double>>",
    )
    out = parallel_project_samples(network, proj, TLRS, buffer=1.0, samples=3)
    got = out.collect()
    assert len(got) == 1
    r = got[0]
    assert r.route == "A" and r.n_hits == 3
    assert r.mean_dist == pytest.approx(0.2)
    assert r.beg_m == pytest.approx(2.0) and r.end_m == pytest.approx(8.0)


def test_parallel_project_samples_match_threshold(spark, network):
    from linref_spark.spatial.match import parallel_project_samples

    # line angles away from A: only its first samples are within buffer
    proj = spark.createDataFrame(
        [(0, {"xs": [2.0, 8.0], "ys": [0.1, 4.0], "ms": [0.0, 7.0]})],
        "event_id long, geom_m struct<xs:array<double>,ys:array<double>,ms:array<double>>",
    )
    strict = parallel_project_samples(
        network, proj, TLRS, buffer=1.0, samples=3, match="all"
    )
    assert strict.count() == 0
    loose = parallel_project_samples(
        network, proj, TLRS, buffer=1.0, samples=3, match=1
    )
    assert {r.route for r in loose.collect()} == {"A"}


def test_parallel_project_samples_choose_all(spark, network):
    from linref_spark.spatial.match import parallel_project_samples

    # midway line within buffer of both routes; choose='all' keeps both,
    # choose=1 keeps the nearer (A)
    proj = spark.createDataFrame(
        [(0, {"xs": [2.0, 8.0], "ys": [2.0, 2.0], "ms": [0.0, 6.0]})],
        "event_id long, geom_m struct<xs:array<double>,ys:array<double>,ms:array<double>>",
    )
    both = parallel_project_samples(
        network, proj, TLRS, buffer=3.5, samples=3, choose="all"
    )
    rows = {r.route: r for r in both.collect()}
    assert set(rows) == {"A", "B"}
    assert rows["A"].match_rank == 1 and rows["A"].mean_dist == pytest.approx(2.0)
    assert rows["B"].match_rank == 2 and rows["B"].mean_dist == pytest.approx(3.0)
    one = parallel_project_samples(
        network, proj, TLRS, buffer=3.5, samples=3, choose=1
    )
    assert [r.route for r in one.collect()] == ["A"]


def test_parallel_project_samples_validation(spark, network):
    from linref_spark.spatial.match import parallel_project_samples

    proj = spark.createDataFrame(
        [(0, {"xs": [2.0, 8.0], "ys": [0.2, 0.2], "ms": [0.0, 6.0]})],
        "event_id long, geom_m struct<xs:array<double>,ys:array<double>,ms:array<double>>",
    )
    with pytest.raises(ValueError):
        parallel_project_samples(network, proj, TLRS, 1.0, match="some")
    with pytest.raises(ValueError):
        parallel_project_samples(network, proj, TLRS, 1.0, choose=0)


def test_match_candidate_cap_and_metrics(spark, network):
    """Flood fixture: many projected lines hugging route A. The per-target
    cap keeps the lowest projected event ids deterministically; the
    metrics companion accounts exactly for what the capped run drops."""
    from linref_spark.spatial.match import match_candidate_metrics

    rows = [
        (i, {"xs": [2.0, 8.0], "ys": [0.2, 0.2], "ms": [0.0, 6.0]})
        for i in range(20)
    ]
    proj = spark.createDataFrame(
        rows,
        "event_id long, geom_m struct<xs:array<double>,ys:array<double>,ms:array<double>>",
    )
    full = match_lines_hausdorff(network, proj, TLRS, buffer=1.0, match=1)
    assert full.count() == 20
    capped = match_lines_hausdorff(
        network, proj, TLRS, buffer=1.0, match=1, max_candidates=5
    )
    got = sorted(r.event_id for r in capped.collect())
    assert got == [0, 1, 2, 3, 4]  # lowest event ids survive the cap
    m = match_candidate_metrics(
        network, proj, TLRS, buffer=1.0, max_candidates=5
    ).first()
    # candidates are TILE-level (pre max_distance): both routes flood
    assert m.n_targets == 2
    assert m.n_capped_targets == 2
    assert m.n_dropped_candidates == 30
    # a cap above the flood is a no-op
    m2 = match_candidate_metrics(
        network, proj, TLRS, buffer=1.0, max_candidates=100
    ).first()
    assert m2.n_capped_targets == 0 and m2.n_dropped_candidates == 0


def test_hausdorff_many_matches_scalar_kernel():
    """Padded-batch Hausdorff (kernels.hausdorff_many) must equal the
    per-pair kernel bit-for-bit across size regimes, including the hybrid
    boundary (batch_max_verts) and densify."""
    import numpy as np

    from linref_spark.geometry import kernels as K

    rng = np.random.RandomState(42)
    for lo, hi, P in [(2, 6, 300), (3, 40, 200), (20, 120, 60)]:
        a_lines, b_lines = [], []
        for _ in range(P):
            n1, n2 = rng.randint(lo, hi), rng.randint(lo, hi)
            a_lines.append(
                (np.cumsum(rng.rand(n1)), np.cumsum(rng.rand(n1) - 0.5))
            )
            b_lines.append(
                (np.cumsum(rng.rand(n2)), np.cumsum(rng.rand(n2) - 0.5))
            )
        for d in (None, 0.2):
            want = np.array([
                K.hausdorff_distance(a[0], a[1], b[0], b[1], densify=d)
                for a, b in zip(a_lines, b_lines)
            ])
            got = K.hausdorff_many(a_lines, b_lines, densify=d)
            assert np.allclose(want, got, rtol=1e-12), (lo, hi, d)
