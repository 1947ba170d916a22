import os

import pytest

from walex_spark.session import get_spark

# ---------------------------------------------------------------------------
# Two-tier suite (VERDICT r11 #2: the driver's pytest run truncated at
# ~69% of the 51-minute full suite, so the gate silently stopped
# gating). The DEFAULT tier — what a bare `python -m pytest tests/`
# runs — skips the entries below (~50 minutes of calm wall, measured
# 2026-08-18 full run: 1110 passed in 70:38) and completes in 28
# minutes measured (1032 passed / 88 skipped). Set WALEX_SLOW_TESTS=1
# to run everything (builder sessions, tools/gate.sh full).
#
# The cut is semantic, not just a time threshold: the slow tier is the
# end-to-end / replay / compaction exercises of the streaming twins
# (whose per-epoch SEMANTICS stay covered in the default tier by
# test_queries' oracle compares — every q_doc_*_incr query compares
# Spark vs DuckDB there) plus the two BPE oracle params whose cost is
# the DUCKDB side (q_doc_bpe_encode's oracle ran 990 s — 16 minutes of
# the 70 — in one recursive-CTE DuckDB execution), plus four >20 s
# stragglers. Node-id substring match keeps the list in one reviewable
# place.
# ---------------------------------------------------------------------------
SLOW_NODE_PATTERNS = (
    # twin e2e / replay / compaction files (wholesale)
    "tests/test_dedup_incr.py",
    "tests/test_drift_incr.py",
    "tests/test_pii_incr.py",
    "tests/test_streaming.py",
    # DuckDB-oracle-dominated parametrized compares (test_queries +
    # test_entry_contract)
    "[q_doc_bpe_encode]",
    "[q_doc_bpe_merges]",
    # individual >20s stragglers (calm full-run durations)
    "[q_doc_ndcg]",
    "[q_doc_nb_classifier]",
    "test_expectation_checks_count_violations",
    "test_hamming_tie_breaks_on_neighbor_id",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight e2e/replay/compaction tests, skipped unless "
        "WALEX_SLOW_TESTS=1 so the default gate finishes inside the "
        "driver's budget",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("WALEX_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier — set WALEX_SLOW_TESTS=1 to run"
    )
    for item in items:
        nodeid = item.nodeid
        if "slow" in item.keywords or any(
            p in nodeid for p in SLOW_NODE_PATTERNS
        ):
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("walex-tests", shuffle_partitions=8)
    yield s
    s.stop()
