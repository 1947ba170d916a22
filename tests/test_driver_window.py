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


def _hard_rows() -> dict:
    """query -> latest round with a HARD driver row (rows+schema+hash
    all true). A rows-only/no_oracle row is NOT a witness — that
    distinction is exactly what r06's rotation got wrong, and it also
    means a query that GAINS an oracle re-enters zero-history until
    the driver hash-checks it once."""
    latest = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            for name, row in json.load(f).items():
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                ):
                    latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_zero_history_queries_are_in_window():
    latest = _hard_rows()
    assert latest, "no CORRECTNESS_r*.json found — gate files missing"
    zero_history = set(QUERIES) - set(latest)
    missing = zero_history - set(DRIVER_ORDER)
    assert not missing, (
        "queries with NO hard driver CORRECTNESS row in any round are "
        f"outside the checked window: {sorted(missing)} — zero-history "
        "queries may never rotate out (see queries.py DRIVER_ORDER rule)"
    )


def test_stale_witnesses_are_in_window():
    """Staleness contract (r07 verdict item 9): a query whose last
    hard row is >= 4 rounds older than the newest recorded round must
    be inside the checked window. The threshold is 4, not 3, because
    150 queries / 50 slots makes a strict 3-round cycle exactly
    capacity-critical — any new query would structurally red the
    board; 4 leaves one round of rotation slack while still making
    staleness a contract instead of a habit."""
    latest = _hard_rows()
    max_round = max(latest.values())
    stale = {n for n, r in latest.items() if n in QUERIES and max_round - r >= 4}
    missing = stale - set(DRIVER_ORDER)
    assert not missing, (
        f"queries last hard-witnessed >= 4 rounds ago are outside the "
        f"window: {sorted(missing)} — rotate them in"
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
    # rows-only check; none is currently declared (q_multimodal_features
    # gained its byte-stripe oracle in r08) — add to this set only with
    # a docstring explaining why the query is not SQL-expressible.
    allowed_rows_only = set()
    no_oracle = [
        n for n in DRIVER_ORDER
        if n not in ORACLES and n not in allowed_rows_only
    ]
    assert not no_oracle, f"windowed queries without oracles: {no_oracle}"


def test_every_registry_query_has_an_oracle():
    # r08 closed the last rows-only entry; regressions here mean the
    # driver falls back to the weak rows-only check for that query.
    missing = set(QUERIES) - set(ORACLES)
    assert not missing, f"queries without oracles: {sorted(missing)}"
