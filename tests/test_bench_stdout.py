"""bench.py's stdout-line contract (ADVICE r10): the single JSON result
line must ALWAYS be emitted and must fit the driver's ~2 kB stdout-tail
capture, shrinking the per-key map rather than raising — a raised guard
(the old bare assert) ate the round's stdout record after the durable
file was already written, and vanished entirely under ``python -O``.

No Spark needed: ``fit_stdout_line`` is pure.
"""

from __future__ import annotations

import json

from bench import fit_stdout_line


def _summary(n_keys: int, key_len: int = 20) -> tuple[dict, list]:
    top = [(f"{'k' * key_len}_{i:03d}", 1.0 + i / 1000) for i in range(n_keys)]
    out = {
        "metric": "headline_queries_total",
        "value": 136.406,
        "unit": "sec",
        "queries": dict(top),
        "sf": 0.1,
        "all_total": 184.752,
        "n_keys": 175,
        "queries_full": "BENCH_out.json",
    }
    return out, top


def test_normal_summary_fits_untouched():
    out, top = _summary(10)
    line = fit_stdout_line(dict(out), top)
    parsed = json.loads(line)
    assert parsed["queries"] == dict(top)
    assert len(line) < 1500


def test_oversize_summary_shrinks_to_fit_and_still_parses():
    # pathological key names blow the line past the limit
    out, top = _summary(10, key_len=400)
    line = fit_stdout_line(dict(out), top)
    assert len(line) < 1500
    parsed = json.loads(line)
    # shrunk but the headline metrics survive intact
    assert len(parsed["queries"]) < 10
    assert parsed["all_total"] == out["all_total"]
    assert parsed["queries_full"] == "BENCH_out.json"


def test_worst_case_drops_the_map_but_always_emits():
    out, top = _summary(10, key_len=2000)
    line = fit_stdout_line(dict(out), top)
    parsed = json.loads(line)
    assert parsed["queries"] == {}
    assert line.endswith("\n") and "\n" not in line[:-1]


def test_non_queries_field_blowout_falls_back_to_headline_fields():
    """ADVICE r11: when a NON-queries field alone exceeds the limit,
    stripping the per-key map can't save the line — the last-resort pass
    must emit only the headline fields (still parseable, still under the
    limit) instead of returning an oversize line the driver's tail
    capture would front-clip to null."""
    out, top = _summary(10)
    out["queries_full"] = "B" * 3000  # a ballooned non-queries field
    line = fit_stdout_line(dict(out), top)
    assert len(line) < 1500
    parsed = json.loads(line)
    assert parsed["value"] == out["value"]
    assert parsed["all_total"] == out["all_total"]
    assert "queries_full" not in parsed


def test_real_r10_shaped_line_is_stable():
    """The shape the driver actually recorded in BENCH_r10.json parses
    and is nowhere near the limit — the shrink path must not fire."""
    out, top = _summary(10)
    line = fit_stdout_line(dict(out), top)
    assert len(line) < 600
