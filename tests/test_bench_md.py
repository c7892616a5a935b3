"""bench.py --scaling rewrites BENCH/BASELINE.md; the hand-written
narrative below MANUAL_MARKER (secondary windows, round history) must
survive the rewrite — a detached scaling run once clobbered it."""

import os

import bench


def test_write_baseline_md_preserves_manual_tail(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    report = {
        "levels": {
            "2": {"sec": 100.0, "clips_per_sec": 1000.0},
            "8": {"sec": 30.0, "clips_per_sec": 3333.3},
        },
        "speedup": 3.333,
        "scaling_efficiency": 0.833,
        "factor": 4.0,
    }

    # first write: no existing file, no manual tail
    bench._write_baseline_md(report, 1000)
    path = tmp_path / "BENCH" / "BASELINE.md"
    text = path.read_text()
    assert "local[2] | 100.0" in text

    # hand-append a manual section under the marker, then rewrite with
    # fresh numbers: auto section updates, manual tail survives verbatim
    manual = bench.MANUAL_MARKER + "\n\n## Secondary window\n\nkeep me\n"
    path.write_text(text + manual)
    report["levels"]["2"]["sec"] = 90.0
    bench._write_baseline_md(report, 1000)
    text2 = path.read_text()
    assert "local[2] | 90.0" in text2 and "local[2] | 100.0" not in text2
    assert text2.count(bench.MANUAL_MARKER) == 1
    assert text2.rstrip().endswith("keep me")

    # a file without the marker is fully regenerated (legacy behavior)
    path.write_text("stale, no marker")
    bench._write_baseline_md(report, 1000)
    assert "stale" not in path.read_text()
