"""bench_scaling.write_report must be non-destructive (VERDICT r4 #3 /
next-round #5): it regenerates ONLY its own marker-delimited mode blocks
and preserves every narrative section, so a routine bench run can't
destroy the evidence trail. Pure-filesystem test — no Spark."""

from __future__ import annotations

import bench_scaling


def _write(monkeypatch, tmp_path, sections):
    monkeypatch.setattr(bench_scaling, "REPO", str(tmp_path))
    bench_scaling.write_report(sections)
    return (tmp_path / "BENCH" / "BASELINE.md").read_text()


def test_fresh_file_gets_header_and_block(monkeypatch, tmp_path):
    text = _write(monkeypatch, tmp_path, {"shuffle": "## S\n\ntable v1"})
    assert text.startswith("# BENCH/BASELINE")
    assert "<!-- bench_scaling:begin shuffle -->" in text
    assert "table v1" in text


def test_rerun_replaces_only_its_block_and_preserves_narrative(
    monkeypatch, tmp_path
):
    _write(monkeypatch, tmp_path, {"shuffle": "table v1", "sharded": "sh v1"})
    p = tmp_path / "BENCH" / "BASELINE.md"
    narrative = "\n## 5M-doc narrative (hand-written)\n\nprecious evidence\n"
    p.write_text(p.read_text() + narrative)

    text = _write(monkeypatch, tmp_path, {"shuffle": "table v2"})
    assert "table v2" in text and "table v1" not in text
    assert "sh v1" in text  # other mode's block untouched
    assert "precious evidence" in text  # narrative preserved
    # running the same write twice changes nothing
    again = _write(monkeypatch, tmp_path, {"shuffle": "table v2"})
    assert again == text
    # exactly one marker pair per mode
    assert text.count("bench_scaling:begin shuffle") == 1
    assert text.count("bench_scaling:end shuffle") == 1
