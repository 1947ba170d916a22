"""bench.py output-contract pins (no Spark needed).

The driver compares the headline "value" across rounds; per-query
failures are caught (bench must never DNF), so a crashed query
contributes 0 seconds to the sum. The headline must therefore go null
whenever any query failed — a partially-failed run can never read as a
speedup over a clean one.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import SUMMARY_BYTE_BUDGET, compact_summary, headline_value


def test_headline_null_on_errors():
    assert headline_value(12.345, {}) == 12.345
    assert headline_value(12.345, {"q_x": "Boom"}) is None


def test_compact_summary_error_run_parses_with_null_value():
    line = compact_summary(
        "m", 3.0, 0.1, {"q_a": 3.0}, {"q_b": "AnalysisException: ..."}
    )
    parsed = json.loads(line)
    assert parsed["value"] is None
    assert parsed["n_errors"] == 1
    assert parsed["queries"] == {"q_a": 3.0}


def test_compact_summary_fits_budget_and_keeps_slowest():
    timings = {f"q_{i:03d}": float(i) for i in range(200)}
    line = compact_summary("m", sum(timings.values()), 0.1, timings, {})
    assert len(line.encode()) <= SUMMARY_BYTE_BUDGET
    parsed = json.loads(line)
    assert parsed["value"] == sum(timings.values())
    kept = parsed["queries"]
    # truncation drops the fast tail, never the slowest entries
    assert "q_199" in kept and "q_198" in kept
