"""Reproduce the frozen model-score thresholds (config.LID_MARGIN_MIN,
config.PPL_MAX) from the seeded synthetic corpus.

The reference fits mixture models offline and pastes the fitted constants
into the pipeline (gamlssMXfits + density crossover -> 8/21/68-minute
strata, Step3-Temporal-Inconsistency.R:150-355).  Our engine does the same
move for its two model scores; this tool is the auditable derivation:

    python tools/derive_thresholds.py [n_clips]

prints the score distributions per planted class and the separation gaps
the frozen constants sit inside.  Pure pandas/numpy — no Spark needed.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from engine import config, fixtures, lid_core, ppl_core, scrub_core  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    clips, planted = fixtures.generate_clips(n, seed=42, profile="test",
                                             with_audio=False)
    tags = dict(zip(planted["clip_id"], planted["defect"]))

    margins: dict[str, list[float]] = {}
    ppls: dict[str, list[float]] = {}
    for r in clips.itertuples(index=False):
        t = r.transcript if isinstance(r.transcript, str) else ""
        scrubbed, _, _ = scrub_core.scrub(t)
        lang, margin = lid_core.score_text(scrubbed or "")
        ppl = ppl_core.perplexity(scrubbed or "", lang)
        cls = tags.get(r.clip_id, "clean")
        grp = {"LID_MISMATCH": "mixed-language", "HIGH_PPL": "shuffled",
               "PII": "pii", "clean": "clean"}.get(cls)
        if grp:
            margins.setdefault(grp, []).append(margin)
            ppls.setdefault(grp, []).append(ppl)

    def stats(d, name):
        print(f"\n{name} per class:  (n, min, p1, median, p99, max)")
        for grp in ("clean", "pii", "mixed-language", "shuffled"):
            v = np.array(d.get(grp, [np.nan]))
            print(f"  {grp:15s} {len(v):5d} "
                  f"{np.nanmin(v):9.2f} {np.nanpercentile(v, 1):9.2f} "
                  f"{np.nanmedian(v):9.2f} {np.nanpercentile(v, 99):9.2f} "
                  f"{np.nanmax(v):9.2f}")

    stats(margins, "LID margin")
    med = float(np.median(margins["mixed-language"]))
    hi = float(np.min(margins["clean"]))
    print(f"  frozen LID_MARGIN_MIN = {config.LID_MARGIN_MIN}"
          f"  (mixed median {med:.2f} .. clean min {hi:.2f}; the mixed tail"
          f" overlaps clean slightly — the threshold is set for zero false"
          f" drops on clean, majority recall on mixed)")

    stats(ppls, "perplexity")
    hi_clean = float(np.max(ppls["clean"] + ppls["pii"]))
    lo_shuf = float(np.min(ppls["shuffled"]))
    print(f"  frozen PPL_MAX = {config.PPL_MAX}"
          f"  (separation window: clean/pii max {hi_clean:.2f}"
          f" .. shuffled min {lo_shuf:.2f})")

    # invariants the frozen constants must satisfy: never drop a clean row
    # (threshold strictly below the clean minimum / above the clean+pii
    # ppl maximum) and catch the majority of the planted defect class
    ok = (med < config.LID_MARGIN_MIN < hi
          and hi_clean < config.PPL_MAX < lo_shuf)
    print(f"\nfrozen thresholds satisfy the derivation invariants: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
