"""Shared-query bench ratio — generated, never hand-computed.

Compares two bench artifacts over the queries PRESENT IN BOTH (new
queries added between rounds would otherwise inflate the newer total)
and prints the shared-set sums and their ratio. Accepts any mix of:

  - BENCH_DETAIL.json        ({"queries": {...}, ...})
  - BENCH_r{N}.json          (driver wrapper; per-query timings live in
                              "parsed"."queries" or inside the "tail"
                              string — both handled)

Usage:
  python tools/bench_ratio.py BENCH_r01.json BENCH_DETAIL.json
"""

from __future__ import annotations

import json
import re
import sys


def load_timings(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc and isinstance(doc["queries"], dict):
        return doc["queries"]
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    # driver wrapper with only a raw stdout tail: recover the LAST
    # complete "queries" object embedded in it
    tail = doc.get("tail", "")
    matches = re.findall(r'"queries"\s*:\s*(\{[^{}]*\})', tail)
    if matches:
        return json.loads(matches[-1])
    raise SystemExit(f"{path}: no per-query timings found")


def shared_ratio(a: dict[str, float], b: dict[str, float]):
    shared = sorted(set(a) & set(b))
    sum_a = sum(a[q] for q in shared)
    sum_b = sum(b[q] for q in shared)
    return shared, sum_a, sum_b


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    pa, pb = sys.argv[1], sys.argv[2]
    a, b = load_timings(pa), load_timings(pb)
    shared, sum_a, sum_b = shared_ratio(a, b)
    print(
        json.dumps(
            {
                "baseline": pa,
                "candidate": pb,
                "n_shared": len(shared),
                "n_baseline_only": len(set(a) - set(b)),
                "n_candidate_only": len(set(b) - set(a)),
                "shared_sum_baseline_sec": round(sum_a, 3),
                "shared_sum_candidate_sec": round(sum_b, 3),
                "ratio_candidate_over_baseline": (
                    round(sum_b / sum_a, 3) if sum_a else None
                ),
            },
            indent=1,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
