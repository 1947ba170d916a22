"""Headline benchmark: runs the engine's query registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion (count-style action via a cheap
collect of the already-small result; the heavy work happens in the
plan, not the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline subset: every operator family, excluding none — the registry
# is the product. Queries returning large row counts still materialize
# fully (toPandas would be driver-bound; count() keeps it distributed).
HEAVY_OUTPUT = {
    "q_window_running_total",
    "q_window_topn_per_group",
    "q_window_lag_lead",
    "q_date_funcs",
    "q_scalar_funcs",
    "q_cdc_filter_events",
    "q_cdc_event_projection",
    "q_cdc_dedup_replay",
    "q_cdc_changes_diff",
    "q_cdc_unwatched_filters",
    "q_cdc_pg_cast",
    "q_cdc_pgoutput_decode",
    "q_cdc_toast_resolve",
    "q_cdc_event_json",
    "q_cdc_sessionize",
    "q_cdc_tumbling_window",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from walex_spark.queries import QUERIES
    from walex_spark.session import get_spark

    spark = get_spark("walex-bench")
    # warm the JVM + parquet footers + Python worker pool once so
    # per-query numbers measure the queries, not session bootstrap
    # (the first mapInPandas query would otherwise absorb 32 worker
    # forks + pandas imports)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name in HEAVY_OUTPUT:
            df.count()
        else:
            df.collect()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "walex_spark query-suite wall clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
