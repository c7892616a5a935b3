"""Step6-graft corpus report: salted two-phase agg == unsalted == pandas."""

from __future__ import annotations

from engine import config
from engine.operators import evaluation, pipeline


def test_salted_report_matches_unsalted_and_pandas(spark, clips_t1):
    path, _, _ = clips_t1
    labels = pipeline.run_pipeline(pipeline.read_clips(spark, path))

    salted = evaluation.corpus_report(labels, salted=True).toPandas()
    plain = evaluation.corpus_report(labels, salted=False).toPandas()

    assert list(salted.columns) == list(plain.columns)
    s = salted.drop(columns=["drop_reason_counts"]).reset_index(drop=True)
    p = plain.drop(columns=["drop_reason_counts"]).reset_index(drop=True)
    assert s.equals(p), "salted two-phase agg must be exact"
    for a, b in zip(salted["drop_reason_counts"], plain["drop_reason_counts"]):
        assert dict(a) == dict(b)

    # independent pandas cross-check of the headline numbers
    lp = labels.toPandas()
    for row in salted.itertuples(index=False):
        grp = lp[lp["lang"] == row.lang]
        assert row.n_total == len(grp)
        assert row.n_kept == int(grp["keep"].sum())
        assert abs(row.keep_rate - grp["keep"].mean()) < 1e-6
        reasons = dict(row.drop_reason_counts)
        dropped = grp[~grp["keep"]]["drop_reason"].value_counts().to_dict()
        for rule in config.RULE_ORDER:
            assert reasons[rule] == dropped.get(rule, 0)
    # every label row is accounted for exactly once
    assert salted["n_total"].sum() == len(lp)
