"""Codifies the driver-window rotation rule that round 6 broke.

The driver's hard correctness gate (CORRECTNESS_r{N}.json) checks only
the first 50 entries of __spark_entry__.queries(). Round 6 rotated out
seven queries as "long-stable" when they had never appeared in any
round's window — "stable" meant local-gate-only, a self-administered
signal. The rule, now enforced:

  A registry query with NO driver CORRECTNESS row in ANY recorded
  round MUST be inside the checked window (DRIVER_ORDER, which is
  capped at 50 by driver_ordered's own assert).

This test reads every CORRECTNESS_r*.json committed at the repo root,
so it automatically relaxes as rounds accumulate witnesses and
automatically tightens when a new query lands without a window slot.
"""

import glob
import json
import os

from walex_spark.queries import DRIVER_ORDER, ORACLES, QUERIES

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _witnessed() -> set:
    seen = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen.update(json.load(f).keys())
    return seen


def test_zero_history_queries_are_in_window():
    witnessed = _witnessed()
    assert witnessed, "no CORRECTNESS_r*.json found — gate files missing"
    zero_history = set(QUERIES) - witnessed
    missing = zero_history - set(DRIVER_ORDER)
    assert not missing, (
        "queries with NO driver CORRECTNESS row in any round are "
        f"outside the checked window: {sorted(missing)} — zero-history "
        "queries may never rotate out (see queries.py DRIVER_ORDER rule)"
    )


def test_driver_order_names_exist_and_fit_window():
    unknown = set(DRIVER_ORDER) - set(QUERIES)
    assert not unknown, f"DRIVER_ORDER names unknown queries: {sorted(unknown)}"
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicate names"
    assert len(DRIVER_ORDER) <= 50, (
        f"driver window overflow: {len(DRIVER_ORDER)} > 50 — the gate "
        "stops at 50, a longer list silently pushes its own tail out"
    )


def test_windowed_queries_carry_oracles():
    # A window slot spent on an oracle-less query only buys the weak
    # rows-only check; that can be deliberate (q_multimodal_features)
    # but must be explicit here.
    allowed_rows_only = {"q_multimodal_features"}
    no_oracle = [
        n for n in DRIVER_ORDER
        if n not in ORACLES and n not in allowed_rows_only
    ]
    assert not no_oracle, f"windowed queries without oracles: {no_oracle}"
