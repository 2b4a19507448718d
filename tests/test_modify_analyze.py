"""Parity tests for event engineering + analysis operators.

Goldens from ``/root/reference/linref/tests/test_events_base.py`` and
hand-executions of the reference algorithms in
``/root/reference/linref/events/modify.py`` (cited inline).
"""

from __future__ import annotations

import pytest

from linref_spark.events import analyze as AN
from linref_spark.events import modify as M
from linref_spark.events.integrate import integrate
from tests.conftest import col_as_array, make_events


def rows(df, *cols, order=("event_id",)):
    return [tuple(r[c] for c in cols) for r in df.orderBy(*order).collect()]


# --- find_same (test_events_base.py:75-97) ----------------------------------


def test_find_same_basic(spark):
    df, lrs = make_events(spark, begs=[0, 5, 0, 5], ends=[3, 8, 3, 8])
    assert list(col_as_array(AN.find_same(df, lrs), "same", 4)) == [
        False, False, True, True,
    ]
    assert list(col_as_array(AN.find_same(df, lrs, keep="none"), "same", 4)) == [
        True, True, True, True,
    ]
    assert list(col_as_array(AN.find_same(df, lrs, keep="last"), "same", 4)) == [
        True, True, False, False,
    ]


def test_find_same_grouped(spark):
    df, lrs = make_events(
        spark, begs=[0, 0, 0, 0], ends=[3, 3, 3, 3], groups=["A", "A", "B", "B"]
    )
    assert list(col_as_array(AN.find_same(df, lrs), "same", 4)) == [
        False, True, False, True,
    ]


# --- find_inside (test_events_base.py:100-137) ------------------------------


def test_find_inside_basic(spark):
    df, lrs = make_events(spark, begs=[0, 2, 5, 1], ends=[10, 8, 7, 3])
    assert list(col_as_array(AN.find_inside(df, lrs), "inside", 4)) == [
        False, True, True, True,
    ]


def test_find_inside_no_containment(spark):
    df, lrs = make_events(spark, begs=[0, 5, 10], ends=[4, 9, 14])
    assert list(col_as_array(AN.find_inside(df, lrs), "inside", 3)) == [
        False, False, False,
    ]


def test_find_inside_enforce_edges(spark):
    df, lrs = make_events(spark, begs=[0, 0], ends=[10, 5])
    assert list(col_as_array(AN.find_inside(df, lrs), "inside", 2)) == [False, False]
    assert list(
        col_as_array(AN.find_inside(df, lrs, enforce_edges=True), "inside", 2)
    ) == [False, True]
    df, lrs = make_events(spark, begs=[0, 3], ends=[10, 10])
    assert list(
        col_as_array(AN.find_inside(df, lrs, enforce_edges=True), "inside", 2)
    ) == [False, True]


def test_find_inside_grouped_and_identical(spark):
    df, lrs = make_events(
        spark, begs=[0, 2, 0, 2], ends=[10, 8, 10, 8], groups=["A", "A", "B", "B"]
    )
    assert list(col_as_array(AN.find_inside(df, lrs), "inside", 4)) == [
        False, True, False, True,
    ]
    df, lrs = make_events(spark, begs=[0, 0], ends=[10, 10])
    assert list(
        col_as_array(AN.find_inside(df, lrs, enforce_edges=True), "inside", 2)
    ) == [False, False]


# --- separate (test_events_base.py:140-227) ---------------------------------


def test_separate_basic_overlap(spark):
    df, lrs = make_events(spark, begs=[0, 5], ends=[8, 12])
    out = rows(M.separate(df, lrs), "beg", "end")
    assert out[0][1] == pytest.approx(6.25)
    assert out[1][0] == pytest.approx(6.25)


def test_separate_no_overlap(spark):
    df, lrs = make_events(spark, begs=[0, 5, 10], ends=[4, 9, 14])
    assert rows(M.separate(df, lrs), "beg", "end") == [
        (0.0, 4.0), (5.0, 9.0), (10.0, 14.0),
    ]


def test_separate_eclipsed(spark):
    df, lrs = make_events(spark, begs=[0, 2], ends=[10, 5])
    out = rows(M.separate(df, lrs), "beg", "end")
    assert out[0] == (0.0, 10.0)
    assert out[1][0] == out[1][1]  # zero-length at center
    assert M.separate(df, lrs, drop_short=True).count() == 1


def test_separate_identical_events(spark):
    df, lrs = make_events(spark, begs=[0, 0, 5], ends=[3, 3, 8])
    assert M.separate(df, lrs, drop_short=True).count() == 2


def test_separate_methods(spark):
    df, lrs = make_events(spark, begs=[0, 5], ends=[8, 12])
    center = rows(M.separate(df, lrs, method="center"), "beg", "end")
    assert center[0][1] == pytest.approx(6.25) and center[1][0] == pytest.approx(6.25)
    left = rows(M.separate(df, lrs, method="left"), "beg", "end")
    assert left[0][1] == pytest.approx(8.0) and left[1][0] == pytest.approx(8.0)
    right = rows(M.separate(df, lrs, method="right"), "beg", "end")
    assert right[0][1] == pytest.approx(5.0) and right[1][0] == pytest.approx(5.0)


def test_separate_grouped(spark):
    df, lrs = make_events(
        spark, begs=[0, 5, 0, 5], ends=[8, 12, 8, 12], groups=["A", "A", "B", "B"]
    )
    out = rows(M.separate(df, lrs), "beg", "end")
    assert out[0][1] == out[2][1] and out[1][0] == out[3][0]


def test_separate_accessor_no_overlap_invariant(spark):
    # test_ext_base.py:639-657 — output has no overlaps, attrs preserved
    df, lrs = make_events(
        spark, begs=[0, 3, 7], ends=[5, 8, 12], groups=["A", "A", "A"],
        extra={"attr": ["x", "y", "z"]},
    )
    out = M.separate(df, lrs)
    got = rows(out, "beg", "end", "attr")
    for i in range(len(got) - 1):
        assert got[i][1] <= got[i + 1][0]
    assert [g[2] for g in got] == ["x", "y", "z"]


# --- dissolve ---------------------------------------------------------------


def test_dissolve_basic(spark):
    # accessor fixture test_ext_base.py:348-369 + :593-607
    df, lrs = make_events(
        spark, begs=[0, 1, 0, 2], ends=[1, 2, 2, 4], groups=["A", "A", "B", "B"],
        extra={"attr": ["x", "x", "z", "w"]},
    )
    out = M.dissolve(df, lrs, retain=["attr"], members_col="members")
    got = rows(out, "route", "beg", "end", "attr", "n_events")
    assert ("A", 0.0, 2.0, "x", 2) in got  # consecutive same-attr merged
    assert len(got) == 3  # B's events are not consecutive-with-same-attr


def test_dissolve_gap_not_merged(spark):
    df, lrs = make_events(
        spark, begs=[0, 2, 5], ends=[2, 4, 7], groups=["A", "A", "A"]
    )
    got = rows(M.dissolve(df, lrs), "beg", "end")
    assert got == [(0.0, 4.0), (5.0, 7.0)]


def test_dissolve_mileage_conserved(spark):
    # integration invariant: total mileage conserved (test_integration.py:98-122)
    df, lrs = make_events(
        spark,
        begs=[0, 2.5, 3.8, 0, 1.2, 0, 4.1],
        ends=[2.5, 3.8, 6.0, 1.2, 3.0, 4.1, 8.0],
        groups=["U", "U", "U", "S", "S", "I", "I"],
    )
    out = M.dissolve(df, lrs)
    tot_in = sum(r[1] - r[0] for r in rows(df, "beg", "end"))
    tot_out = sum(r[1] - r[0] for r in rows(out, "beg", "end"))
    assert tot_out == pytest.approx(tot_in)
    assert out.count() == 3  # one span per route


# --- resegment (hand-executed goldens of modify.py:306-433) -----------------

RESEG_GOLDEN = {
    # event (0, 7.2) then (10, 13), L=2.0
    "none": [(0, 2), (2, 4), (4, 6), (10, 12)],
    "cut": [(0, 2), (2, 4), (4, 6), (6, 7.2), (10, 12), (12, 13)],
    "left": [(0, 2), (2, 4), (4, 6), (5.2, 7.2), (10, 12), (11, 13)],
    "right": [(0, 2), (2, 4), (4, 6), (6, 8), (10, 12), (12, 14)],
    "extend": [(0, 2), (2, 4), (4, 7.2), (10, 13)],
    "balance": [(0, 2), (2, 4), (4, 6), (6, 7.2), (10, 12), (12, 13)],
}


@pytest.mark.parametrize("fill", sorted(M.SEGMENT_FILL_ALL))
def test_resegment_fill_modes(spark, fill):
    df, lrs = make_events(
        spark, begs=[0.0, 10.0], ends=[7.2, 13.0], groups=["A", "A"]
    )
    out = M.resegment(df, lrs, length=2.0, fill=fill)
    got = rows(out, "beg", "end")
    exp = [(float(a), float(b)) for a, b in RESEG_GOLDEN[fill]]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g[0] == pytest.approx(e[0]) and g[1] == pytest.approx(e[1])


def test_resegment_balance_extend_case(spark):
    # (0, 6.5) L=2: remainder 0.5 < 1 -> last default segment dropped, extended
    df, lrs = make_events(spark, begs=[0.0], ends=[6.5], groups=["A"])
    got = rows(M.resegment(df, lrs, length=2.0, fill="balance"), "beg", "end")
    assert got == [(0.0, 2.0), (2.0, 4.0), (4.0, 6.5)]


def test_resegment_short_event(spark):
    df, lrs = make_events(spark, begs=[0.0], ends=[0.5], groups=["A"])
    assert rows(M.resegment(df, lrs, 2.0, "none"), "beg", "end") == [(0.0, 0.5)]
    assert rows(M.resegment(df, lrs, 2.0, "right"), "beg", "end") == [(0.0, 2.0)]
    assert rows(M.resegment(df, lrs, 2.0, "left"), "beg", "end") == [(-1.5, 0.5)]


def test_resegment_source_mapping_and_attrs(spark):
    df, lrs = make_events(
        spark, begs=[0.0, 10.0], ends=[4.0, 12.0], groups=["A", "B"],
        extra={"attr": ["x", "y"]},
    )
    out = M.resegment(df, lrs, length=2.0, fill="cut")
    got = rows(out, "source_event_id", "attr", "beg", "end")
    assert got == [
        (0, "x", 0.0, 2.0), (0, "x", 2.0, 4.0), (1, "y", 10.0, 12.0),
    ]


def test_resegment_mileage_conserved_cut(spark):
    df, lrs = make_events(
        spark, begs=[0, 2.5, 3.8], ends=[2.5, 3.8, 6.0], groups=["U", "U", "U"]
    )
    out = M.resegment(df, lrs, length=0.5, fill="cut")
    tot = sum(r[1] - r[0] for r in rows(out, "beg", "end"))
    assert tot == pytest.approx(6.0)
    assert all(r[1] - r[0] <= 0.5 + 1e-12 for r in rows(out, "beg", "end"))


# --- extend / shift / round / point_to_linear --------------------------------


def test_extend_shift_round(spark):
    df, lrs = make_events(spark, begs=[1.234], ends=[5.678], groups=["A"])
    got = rows(M.extend(df, lrs, 1.0), "beg", "end")
    assert got[0][0] == pytest.approx(0.234) and got[0][1] == pytest.approx(6.678)
    assert rows(M.shift(df, lrs, 10.0), "beg", "end") == [(11.234, 15.678)]
    assert rows(M.round_measures(df, lrs, decimals=1), "beg", "end") == [(1.2, 5.7)]
    assert rows(M.round_measures(df, lrs, factor=0.5), "beg", "end") == [(1.0, 5.5)]


def test_point_to_linear(spark):
    df, lrs = make_events(spark, locs=[2.5], groups=["A"])
    assert rows(M.point_to_linear(df, lrs), "beg", "end") == [(2.5, 2.5)]


# --- integrate (integration.py:6-160) ----------------------------------------


def test_integrate_two_frames(spark):
    a, alrs = make_events(spark, begs=[0, 10], ends=[10, 20], groups=["R", "R"])
    b, blrs = make_events(spark, begs=[5], ends=[15], groups=["R"])
    out = integrate([(a, alrs), (b, blrs)])
    got = rows(out, "beg", "end", "index_0", "index_1")
    # edges 0,5,10,15,20 -> intervals (0,5),(5,10),(10,15),(15,20)
    assert got == [
        (0.0, 5.0, 0, -1),
        (5.0, 10.0, 0, 0),
        (10.0, 15.0, 1, 0),
        (15.0, 20.0, 1, -1),
    ]


def test_integrate_fill_gaps(spark):
    a, alrs = make_events(spark, begs=[0], ends=[5], groups=["R"])
    b, blrs = make_events(spark, begs=[10], ends=[15], groups=["R"])
    no_fill = integrate([(a, alrs), (b, blrs)])
    assert rows(no_fill, "beg", "end") == [(0.0, 5.0), (10.0, 15.0)]
    fill = integrate([(a, alrs), (b, blrs)], fill_gaps=True)
    assert rows(fill, "beg", "end") == [(0.0, 5.0), (5.0, 10.0), (10.0, 15.0)]


def test_integrate_split_at_locs(spark):
    a, alrs = make_events(spark, begs=[0], ends=[10], groups=["R"])
    p, plrs = make_events(spark, locs=[4.0], groups=["R"])
    out = integrate([(a, alrs), (p, plrs)], split_at_locs=True)
    assert rows(out, "beg", "end", "index_0", "index_1") == [
        (0.0, 4.0, 0, -1), (4.0, 10.0, 0, -1),
    ]


def test_integrate_expand(spark):
    # overlapping sources in one layer duplicate the interval per match
    a, alrs = make_events(spark, begs=[0, 0], ends=[10, 10], groups=["R", "R"])
    b, blrs = make_events(spark, begs=[0], ends=[10], groups=["R"])
    out = integrate([(a, alrs), (b, blrs)], expand=True)
    got = rows(out, "beg", "end", "index_0", "index_1", order=("index_0",))
    assert got == [(0.0, 10.0, 0, 0), (0.0, 10.0, 1, 0)]


def test_integrate_multi_group(spark):
    a, alrs = make_events(
        spark, begs=[0, 0], ends=[10, 8], groups=["R", "S"]
    )
    b, blrs = make_events(spark, begs=[5, 2], ends=[15, 4], groups=["R", "S"])
    out = integrate([(a, alrs), (b, blrs)], fill_gaps=False)
    got = rows(out, "route", "beg", "end", order=("route", "beg"))
    assert got == [
        ("R", 0.0, 5.0), ("R", 5.0, 10.0), ("R", 10.0, 15.0),
        ("S", 0.0, 2.0), ("S", 2.0, 4.0), ("S", 4.0, 8.0),
    ]


# --- geometry-sync guard (linref/ext/validation.py:9-49) ---------------------


def test_geometry_sync_guard_modes(spark):
    import warnings

    from pyspark.sql import functions as F

    from linref_spark.lrs import LRS, GeometrySyncError, GeometrySyncWarning

    df = spark.createDataFrame(
        [("A", 0.0, 5.0, 0)], "route string, beg double, end double, event_id long"
    ).withColumn(
        "geom_m",
        F.struct(
            F.array(F.lit(0.0), F.lit(5.0)).alias("xs"),
            F.array(F.lit(0.0), F.lit(0.0)).alias("ys"),
            F.array(F.lit(0.0), F.lit(5.0)).alias("ms"),
        ),
    )
    base = dict(key_cols=("route",), beg_col="beg", end_col="end", geom_m_col="geom_m")

    # drop (default): geometry column removed
    out = M.shift(df, LRS(**base), 1.0)
    assert "geom_m" not in out.columns

    # none: untouched
    out = M.shift(df, LRS(**base, geometry_sync="none"), 1.0)
    assert "geom_m" in out.columns

    # warn: kept + warned
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = M.shift(df, LRS(**base, geometry_sync="warn"), 1.0)
        assert "geom_m" in out.columns
        assert any(issubclass(x.category, GeometrySyncWarning) for x in w)

    # error: raises
    import pytest as _pytest

    with _pytest.raises(GeometrySyncError):
        M.extend(df, LRS(**base, geometry_sync="error"), 1.0)

    # per-call override wins over the LRS attribute
    out = M.round_measures(df, LRS(**base, geometry_sync="error"), decimals=1,
                           geometry_sync="none")
    assert "geom_m" in out.columns

    # invalid values rejected
    with _pytest.raises(ValueError):
        LRS(**base, geometry_sync="explode")

    # non-spatial frames unaffected
    out = M.shift(df.drop("geom_m"), LRS(key_cols=("route",), beg_col="beg",
                                         end_col="end"), 1.0)
    assert out.count() == 1
