"""Threshold refit (engine/refit.py): deterministic proposals that land in
the planted separation windows of the seeded corpus."""

from __future__ import annotations

import numpy as np

from engine import refit
from engine.operators import pipeline, scoring


def test_kmeans2_boundary_separates_two_modes():
    centers = np.linspace(0, 10, 100)
    counts = np.zeros(100, dtype=np.int64)
    counts[10:20] = 50   # mode ~1.0-2.0
    counts[80:90] = 30   # mode ~8.0-9.0
    b = refit.kmeans2_boundary(centers, counts)
    assert 2.0 < b < 8.0


def test_kmeans2_boundary_degenerate():
    c = np.linspace(0, 1, 8)
    assert refit.kmeans2_boundary(c, np.zeros(8, dtype=np.int64)) is not None
    one = np.zeros(8, dtype=np.int64)
    one[3] = 5
    assert 0.0 <= refit.kmeans2_boundary(c, one) <= 1.0


def test_refit_is_deterministic_and_in_window(spark, clips_t1):
    path, _, _ = clips_t1
    scored = scoring.score_clips(pipeline.read_clips(spark, path))
    scored = scored.persist()
    p1 = refit.refit_thresholds(scored)
    p2 = refit.refit_thresholds(scored)
    scored.unpersist()
    assert p1 == p2  # same corpus -> same proposal, always

    prop = p1["proposed"]
    # ppl candidate must sit above the clean/pii mass (median) and far
    # below the empty-text sentinel (p99 can BE the 1e9 sentinel, so it is
    # context, not a bound)
    assert p1["context"]["ppl_p50_p90_p99"][0] < prop["PPL_MAX"] < 400.0
    assert 0.0 < prop["LID_MARGIN_MIN"] < 2.0
    assert 0.0 < prop["SILENCE_RATIO_MAX"] < 1.0
    assert p1["rule_version"] and p1["n_rows"] > 0
    assert p1["current"]["PPL_MAX"] == 90.0


def test_approx_percentile_within_tolerance(spark):
    """The corpus-scale percentile path: percentile_approx with accuracy K
    guarantees rank error <= n/K.  The refit/quantile queries use exact
    percentile (driver-gated determinism); at 10^12 rows a job swaps in
    approx — this pins that the swap stays within its documented bound on
    a known distribution."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    vals = rng.lognormal(3.0, 1.0, 20_000).tolist()
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    row = df.select(
        F.expr("percentile(v, array(0.5, 0.9, 0.99))").alias("exact"),
        F.expr("percentile_approx(v, array(0.5, 0.9, 0.99), 1000)")
        .alias("approx")).first()
    svals = sorted(vals)
    n = len(svals)
    for e, a in zip(row["exact"], row["approx"]):
        # rank error bound: approx value's rank within n/1000 of exact's
        import bisect
        re_ = bisect.bisect_left(svals, e)
        ra = bisect.bisect_left(svals, a)
        assert abs(re_ - ra) <= n // 1000 + 1, (e, a, re_, ra)


def test_percentiles_path_selection(spark):
    """_percentiles routes by corpus size: exact at/below
    EXACT_PERCENTILE_MAX_ROWS, sketch above — and both paths agree on a
    small frame (where the sketch is exact too)."""
    from engine import refit

    df = spark.createDataFrame([(float(i),) for i in range(1, 1002)],
                               "ppl_score double")
    exact = refit._percentiles(df, "ppl_score", [0.5, 0.99], n_rows=1001)
    approx = refit._percentiles(df, "ppl_score", [0.5, 0.99],
                                n_rows=refit.EXACT_PERCENTILE_MAX_ROWS + 1)
    forced = refit._percentiles(df, "ppl_score", [0.5, 0.99], exact=False)
    assert approx == forced
    # on 1001 rows the sketch holds every value: identical ranks
    for e, a in zip(exact, approx):
        assert abs(e - a) <= 1.0, (exact, approx)
