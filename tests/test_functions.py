"""Golden-value tests for the native-expression function library,
mirroring the reference's spec tests (SURVEY.md §5):
haversine goldens (reference tests/test_haversine.py) and the risk
additive terms / category boundaries (tests/test_risk_score.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skysafe_datalake_spark.functions.geo import haversine_km
from skysafe_datalake_spark.functions.phase import flight_phase_id, flight_phase_rules
from skysafe_datalake_spark.functions.risk import risk_category, risk_score

PARIS = (48.8566, 2.3522)
LYON = (45.7640, 4.8357)
TOULOUSE = (43.6047, 1.4442)


def _distance(spark, p1, p2) -> float:
    df = spark.createDataFrame(
        [(p1[0], p1[1], p2[0], p2[1])], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    return df.select(
        haversine_km("lat1", "lon1", "lat2", "lon2").alias("d")
    ).first()["d"]


def test_haversine_same_point_zero(spark):
    assert _distance(spark, PARIS, PARIS) == pytest.approx(0.0, abs=0.01)


def test_haversine_paris_lyon(spark):
    assert 380 < _distance(spark, PARIS, LYON) < 410


def test_haversine_paris_toulouse(spark):
    assert 575 < _distance(spark, PARIS, TOULOUSE) < 605


def test_haversine_symmetry(spark):
    d1 = _distance(spark, PARIS, LYON)
    d2 = _distance(spark, LYON, PARIS)
    assert d1 == pytest.approx(d2, rel=1e-6)
    assert d1 > 0


# Risk: defaults give score 0 (reference tests/test_risk_score.py:9-17)
_DEFAULTS = dict(
    w_weather_code=0,
    w_wind_gusts_10m=0.0,
    w_precipitation=0.0,
    w_visibility=10000.0,
    w_cloud_cover=0,
    on_ground=False,
    baro_altitude=10000.0,
)


def _score(spark, **overrides) -> int:
    row = {**_DEFAULTS, **overrides}
    df = spark.createDataFrame(
        [tuple(row.values())],
        "w_weather_code int, w_wind_gusts_10m double, w_precipitation double, "
        "w_visibility double, w_cloud_cover int, on_ground boolean, baro_altitude double",
    )
    expr = risk_score(
        F.col("w_weather_code"),
        F.col("w_wind_gusts_10m"),
        F.col("w_precipitation"),
        F.col("w_visibility"),
        F.col("w_cloud_cover"),
        F.col("on_ground"),
        F.col("baro_altitude"),
    )
    return df.select(expr.cast("int").alias("s")).first()["s"]


@pytest.mark.parametrize(
    "override,expected",
    [
        (dict(), 0),
        (dict(w_weather_code=95), 40),
        (dict(w_wind_gusts_10m=81.0), 25),
        (dict(w_wind_gusts_10m=51.0), 10),
        (dict(w_precipitation=6.0), 20),
        (dict(w_precipitation=0.5), 10),
        (dict(w_visibility=900.0), 20),
        (dict(w_visibility=2500.0), 10),
        (dict(w_cloud_cover=81), 10),
        (dict(w_cloud_cover=51), 5),
        (dict(baro_altitude=200.0), 15),
        (dict(baro_altitude=200.0, on_ground=True), 0),
    ],
)
def test_risk_terms(spark, override, expected):
    assert _score(spark, **override) == expected


def test_risk_worst_case_uncapped_130(spark):
    # reference tests/test_risk_score.py:94-106 — no clamp at 100
    assert (
        _score(
            spark,
            w_weather_code=99,
            w_wind_gusts_10m=100.0,
            w_precipitation=10.0,
            w_visibility=500.0,
            w_cloud_cover=95,
            baro_altitude=100.0,
        )
        == 130
    )


@pytest.mark.parametrize("score,cat", [(0, "LOW"), (29, "LOW"), (30, "MEDIUM"), (59, "MEDIUM"), (60, "HIGH"), (130, "HIGH")])
def test_risk_category_boundaries(spark, score, cat):
    df = spark.createDataFrame([(score,)], "s int")
    assert df.select(risk_category(F.col("s")).alias("c")).first()["c"] == cat


@pytest.mark.parametrize(
    "alt,vel,vr,phase,pid",
    [
        (100.0, 30.0, 0.0, "Takeoff / Landing", 0),
        (11000.0, 250.0, 0.5, "Cruise", 2),
        (5000.0, 180.0, 10.0, "Climb / Descent", 1),
        (100.0, 120.0, 5.0, "Climb / Descent", 1),  # low but fast
    ],
)
def test_phase_rules(spark, alt, vel, vr, phase, pid):
    df = spark.createDataFrame([(alt, vel, vr)], "a double, v double, r double")
    out = df.select(
        flight_phase_rules(F.col("a"), F.col("v"), F.col("r")).alias("p")
    ).withColumn("pid", flight_phase_id(F.col("p")))
    row = out.first()
    assert row["p"] == phase
    assert row["pid"] == pid


def test_approx_aggregates_track_exact(spark):
    """The 100 TB scale path for count_distinct / percentile_stats is
    HLL++ (approx_count_distinct) and GK quantiles (percentile_approx)
    — single-pass, mergeable sketch state instead of Expand/sort.
    Contract: within stated error of the exact answers."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL

    from skysafe_datalake_spark.workload.tables import load

    o = load(spark, SF_SMALL, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("nd_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("nd_approx"),
        F.expr("percentile(o_totalprice, array(0.5, 0.9))").alias("p_exact"),
        F.percentile_approx(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
        ).alias("p_approx"),
    ).first()
    assert abs(row["nd_approx"] - row["nd_exact"]) / row["nd_exact"] < 0.05
    spread = max(row["p_exact"]) - min(row["p_exact"]) or 1.0
    for exact, approx in zip(row["p_exact"], row["p_approx"]):
        assert abs(approx - exact) / spread < 0.02


def test_quality_score_zero_word_docs_get_no_stopword_award(spark):
    """A punctuation-only/empty doc has no words; the vacuous
    0*100 >= 0*5 used to hand it the full 30-point stopword-density
    term, outranking real short English text (round-9 review)."""
    from pyspark.sql import functions as F

    from skysafe_datalake_spark.functions.text import quality_score

    rows = spark.createDataFrame(
        [(1, "!!!"), (2, ""), (3, "the cat and the dog sat there")],
        "id long, text string",
    )
    out = {
        r["id"]: r["q"]
        for r in rows.select(
            "id", quality_score(F.col("text")).alias("q")
        ).collect()
    }
    # "!!!": 5 (short) + 0 (no words -> no stopword award) + 0 (all
    # punctuation trips the noise penalty)
    assert out[1] == 5
    # "": 5 + 0 (no stopword award) + 30 (no punctuation)
    assert out[2] == 35
    # real text with stopword density >= 5% earns the full 30
    assert out[3] == 5 + 30 + 30


def test_grid_cell_no_cross_row_collisions_at_fine_cells(spark):
    """The fixed 100000 row stride collided across latitude rows once
    cell_deg < 0.0036; the stride is now sized to the longitude cell
    count (round-9 review)."""
    from pyspark.sql import functions as F

    from skysafe_datalake_spark.functions.geo import grid_cell

    # two points in DIFFERENT cells that collided under the old
    # stride: lat rows 1 apart used to alias lon cells 100000 apart
    cell = 0.001  # 360000 lon cells per row > old 100000 stride
    pts = spark.createDataFrame(
        [(1, 0.0000, 0.0000), (2, 0.0010, -99.9990)],
        "id long, lat double, lon double",
    )
    out = pts.select(grid_cell("lat", "lon", cell)).distinct()
    assert out.count() == 2


def test_grid_cell_rejects_degenerate_cell_deg(spark):
    """ADVICE r9: cell_deg <= 0 raised ZeroDivisionError (or silently
    inverted the grid), and below ~3.6e-8 deg lat_i * stride wrapped a
    signed bigint so distant cells aliased — both now explicit errors,
    mirroring zorder_key's bits*n <= 63 guard."""
    from skysafe_datalake_spark.functions.geo import grid_cell

    for bad in (0.0, -0.5):
        with pytest.raises(ValueError, match="cell_deg > 0"):
            grid_cell("lat", "lon", bad)
    with pytest.raises(ValueError, match="bigint"):
        grid_cell("lat", "lon", 1e-9)
    # ~1e-7 deg (centimeter cells) still fits: no raise
    grid_cell("lat", "lon", 1e-7)
