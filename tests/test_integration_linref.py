"""End-to-end parity with the reference's integration suite on its own
bundled toy datasets (roadways 10 / crashes 20 / pavement 14 rows).

Expectations transcribed from
``/root/reference/linref/tests/test_integration.py`` (dissolve 10->3,
mileage conservation, resegment bounds/contiguity, relate count total = 20,
HIN distribute conservation ~= 20, crash-proximity sanity). Data files are
the reference's fixture data (GeoJSON/CSV), loaded with the stdlib — no
reference code involved.

Round 3: the whole suite drives through the :class:`linref_spark.wrap`
accessor facade — the same chained UX the reference exposes as ``df.lr.*``
(``linref/ext/base.py:30``) — asserting the facade delegates every operator
correctly; the assertions themselves are unchanged from the free-function
version.
"""

from __future__ import annotations

import csv
import json

import pytest
from pyspark.sql import functions as F

from linref_spark import wrap

DATA = "/root/reference/linref/datasets/_data"


@pytest.fixture(scope="module")
def roads(spark):
    feats = json.load(open(f"{DATA}/roadways.geojson"))["features"]
    rows = []
    for f in feats:
        p = f["properties"]
        coords = f["geometry"]["coordinates"]
        rows.append(
            (
                p["route"], float(p["beg"]), float(p["end"]),
                int(p["traffic_volume"]), int(p["speed_limit"]),
                [float(c[0]) for c in coords], [float(c[1]) for c in coords],
            )
        )
    df = spark.createDataFrame(
        rows,
        ["route", "beg", "end", "traffic_volume", "speed_limit", "geom_xs", "geom_ys"],
    )
    lf = wrap(df, key_cols=("route",), beg_col="beg", end_col="end",
              closed="left_mod")
    return lf.add_geom_m().cache()


@pytest.fixture(scope="module")
def crashes(spark):
    feats = json.load(open(f"{DATA}/crashes.geojson"))["features"]
    rows = []
    for f in feats:
        p = f["properties"]
        x, y = f["geometry"]["coordinates"]
        rows.append(
            (int(p["crash_id"]), p["route"], float(p["loc"]), p["severity"],
             p["mode"], float(x), float(y))
        )
    df = spark.createDataFrame(
        rows, ["crash_id", "route", "loc", "severity", "mode", "x", "y"]
    )
    return wrap(df, key_cols=("route",), loc_col="loc", closed="left_mod").cache()


@pytest.fixture(scope="module")
def pavement(spark):
    with open(f"{DATA}/pavement.csv") as fh:
        rows = [
            (r["route"], float(r["beg"]), float(r["end"]),
             int(r["condition_rating"]), r["surface_type"])
            for r in csv.DictReader(fh)
        ]
    df = spark.createDataFrame(
        rows, ["route", "beg", "end", "condition_rating", "surface_type"]
    )
    return wrap(df, key_cols=("route",), beg_col="beg", end_col="end",
                closed="left_mod").cache()


def test_dataset_shapes(roads, crashes, pavement):
    # test_integration.py:44-46
    assert roads.count() == 10
    assert crashes.count() == 20
    assert pavement.count() == 14
    r = {x.route for x in roads.df.select("route").distinct().collect()}
    c = {x.route for x in crashes.df.select("route").distinct().collect()}
    p = {x.route for x in pavement.df.select("route").distinct().collect()}
    assert r == c == p


def test_dissolve_and_resegment(spark, roads):
    # test_integration.py:84-122 — one facade chain end-to-end
    dissolved = roads.dissolve()
    assert dissolved.count() == 3
    orig = roads.df.agg(F.sum(F.col("end") - F.col("beg"))).first()[0]
    diss = dissolved.df.agg(F.sum(F.col("end") - F.col("beg"))).first()[0]
    assert diss == pytest.approx(orig, abs=1e-6)

    reseg = roads.dissolve().resegment(length=5.0, fill="cut")
    tot = reseg.df.agg(F.sum(F.col("end") - F.col("beg"))).first()[0]
    assert tot == pytest.approx(orig, abs=1e-6)
    assert reseg.df.agg(F.max(F.col("end") - F.col("beg"))).first()[0] <= 5.0 + 1e-9
    # contiguity within routes
    for route in ("US-101", "SR-1", "I-5"):
        sub = sorted(
            (r.beg, r.end)
            for r in reseg.where(F.col("route") == route).collect()
        )
        for (b1, e1), (b2, e2) in zip(sub, sub[1:]):
            assert b2 == pytest.approx(e1)


def test_relate_count_preserves_crashes(spark, roads, crashes):
    # test_integration.py: count().sum() == 20 for full-coverage segmentation
    reseg = roads.dissolve().resegment(length=5.0, fill="cut")
    counted = reseg.relate(crashes).count(out_col="n")
    assert counted.df.agg(F.sum("n")).first()[0] == 20


def test_hin_workflow(spark, roads, crashes):
    # test_integration.py:333-369 — the flagship chain:
    # dissolve -> resegment -> relate -> distribute, all through the facade
    reseg = roads.dissolve().resegment(length=0.5, fill="cut").cache()
    rel = reseg.relate(crashes).cache()
    scored = rel.distribute(decay_size=2, decay_func="linear")
    n_seg = reseg.count()
    rows = scored.collect()
    assert len(rows) == n_seg
    assert all(r.distributed >= -1e-12 for r in rows)
    assert sum(r.distributed for r in rows) == pytest.approx(20.0, abs=1e-4)

    counted = {r.event_id: r.n for r in rel.count(out_col="n").collect()}
    assert sum(counted.values()) == 20
    scores = {r.event_id: r.distributed for r in rows}
    with_crash = [scores[k] for k, v in counted.items() if v > 0]
    without = [scores[k] for k, v in counted.items() if v == 0]
    assert sum(with_crash) / len(with_crash) > sum(without) / len(without)


def test_pavement_overlay_mean(spark, roads, pavement):
    # linear x linear conflation: length-weighted mean condition per road
    out = roads.relate(pavement, how="overlay", norm_by="right").mean(
        "condition_rating", out_col="rating"
    )
    rows = out.collect()
    assert all(r.rating is not None for r in rows)
    # ratings bounded by the source domain
    lo = pavement.df.agg(F.min("condition_rating")).first()[0]
    hi = pavement.df.agg(F.max("condition_rating")).first()[0]
    assert all(lo - 1e-9 <= r.rating <= hi + 1e-9 for r in rows)


def test_spatial_projection_recovers_locs(spark, roads, crashes):
    # project crash points onto the road network; recovered mileposts
    # should match the recorded loc column (crash geometry was generated
    # on-route in the reference fixtures)
    out = roads.project(crashes.df, buffer=0.25, res=10, x_col="x", y_col="y")
    # crashes carry their own 'route' column -> suffixed to route_point;
    # 'route' in the output is the matched route
    got = {r.crash_id: (r.route, r.loc_mp, r.loc) for r in out.collect()}
    matched_routes_ok = all(r.route == r.route_point for r in out.collect())
    assert matched_routes_ok
    assert len(got) == 20
    matches = sum(
        1 for route, loc_mp, loc in got.values() if abs(loc_mp - loc) < 0.15
    )
    assert matches >= 16  # most crashes sit on their recorded milepost


def test_facade_roundtrips_and_lrs_tracking(spark, crashes, pavement):
    # extend on a point frame yields a linear frame (loc +/- d)
    buffered = crashes.extend(0.5)
    assert buffered.lrs.is_linear and buffered.lrs.is_located
    spans = buffered.df.select("beg", "end", "loc").first()
    assert spans.beg == pytest.approx(spans.loc - 0.5)
    assert spans.end == pytest.approx(spans.loc + 0.5)
    # point_to_linear tracks the new roles too
    aslin = crashes.point_to_linear()
    assert aslin.lrs.beg_col == "beg" and not aslin.lrs.is_point
    # transpose aggregates onto the other side
    rel = pavement.relate(crashes)
    onto_crashes = rel.T.count(out_col="n_segs")
    assert onto_crashes.count() == crashes.count()
    # geometry_sync default rides the facade: shifting a frame with geom_m
    # drops the geometry column under the default 'drop' policy
    assert crashes.shift(1.0).lrs.loc_col == "loc"


def test_default_lrs_registry(spark):
    """Package-level default LRS (reference linref/options.py:63-83): set
    once, wrap() with no roles picks it up; explicit roles still win;
    reset clears."""
    import linref_spark as ls

    df = spark.createDataFrame(
        [("A", 0.0, 5.0), ("A", 5.0, 9.0)], "route string, beg double, end double"
    )
    try:
        got = ls.set_default_lrs(
            key_cols=("route",), beg_col="beg", end_col="end", closed="left_mod"
        )
        assert ls.options.default_lrs is got
        lf = ls.wrap(df)
        assert lf.lrs.key_cols == ("route",) and lf.lrs.closed == "left_mod"
        # per-call override of a registered field
        lf2 = ls.wrap(df, closed="right")
        assert lf2.lrs.closed == "right" and lf2.lrs.beg_col == "beg"
        # explicit roles bypass the registry entirely
        pdf = spark.createDataFrame([("A", 1.0)], "route string, loc double")
        lp = ls.wrap(pdf, key_cols=("route",), loc_col="loc")
        assert lp.lrs.is_point
        # invalid values rejected
        with pytest.raises(ValueError):
            ls.options.default_lrs = "not an lrs"
        with pytest.raises(ValueError):
            ls.options.default_geometry_sync = "explode"
    finally:
        ls.options.reset()
    assert ls.options.default_lrs is None
    assert ls.get_default_lrs() is None


def test_facade_dedup_relate_chain(spark):
    """One-front-door chain mixing the web dedup operators with a relate
    aggregation — the README example shape."""
    import linref_spark as ls

    docs = spark.createDataFrame(
        [
            ("A", 0.0, 5.0, "the quick brown fox jumps over the lazy dog"),
            ("A", 5.0, 9.0, "the quick brown fox jumps over the lazy dog"),
            ("B", 0.0, 4.0, "an entirely different document about spark"),
        ],
        "route string, beg double, end double, text string",
    )
    lf = ls.wrap(docs, key_cols=("route",), beg_col="beg", end_col="end")
    enriched = lf.with_token_stats().with_lang_id().with_fingerprint()
    assert {"n_tokens", "lang_pred", "fingerprint"} <= set(enriched.columns)
    # exact dedup keeps one of the two identical texts
    kept = enriched.dedup_exact()
    assert kept.count() == 2
    # near-dup clusters label every row with its canonical id
    grouped = enriched.near_dup_groups(num_hashes=8, bands=4, shingle_k=2)
    labels = {r.event_id: r.canonical_id for r in grouped.collect()}
    assert len(set(labels.values())) == 2
    # the deduped frame still relates like any event frame
    pts = spark.createDataFrame(
        [("A", 1.0, 1.0), ("A", 6.0, 1.0), ("B", 2.0, 1.0)],
        "route string, loc double, one double",
    )
    lp = ls.wrap(pts, key_cols=("route",), loc_col="loc")
    counted = kept.relate(lp).sum("one", out_col="n_pts")
    # dedup dropped (A, 5-9), so the loc=6 point no longer matches: 2 of 3
    assert counted.df.agg(F.sum("n_pts")).first()[0] == pytest.approx(2.0)
