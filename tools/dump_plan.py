"""Dump ``explain("formatted")`` for registry queries to files.

Evidence tool for optimization rounds: the judge cannot run Spark, so
plan claims ("2 Exchange -> 1", "read-back scan removed") are backed
by committed plan files under plans/r<N>/.

For the incremental (foreachBatch) twins the registry function runs
its epochs eagerly and returns only the trivial read-back frame, so
``--twin-emission`` additionally captures the LAST epoch's emission
plan — the DataFrame process_batch returns — which is where the
per-epoch structure lives.

Usage:
  python tools/dump_plan.py --out plans/r11 --suffix _after name...
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# Twins whose interesting plan is the last epoch's emission: name ->
# (builder returning that emission DataFrame). Mirrors the registry
# wiring (3 epochs on doc_id % 3) without materializing the final
# read-back.
def _twin_emission(name: str, spark, sf_dir: str):
    import tempfile

    from pyspark.sql import functions as F

    from walex_spark.streaming import dedup_incr as DI

    root = tempfile.mkdtemp(prefix=f"plan_{name}_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mk = {
        "q_doc_despan_incr": lambda: DI.IncrementalDespanIndex(
            f"{root}/idx", win_len=40, min_count=2
        ),
        "q_doc_winnow_incr": lambda: DI.IncrementalWinnowIndex(
            f"{root}/idx", k=16, window=8, min_shared=4
        ),
        "q_doc_minhash_incr": lambda: DI.IncrementalMinHashIndex(f"{root}/idx"),
        "q_doc_simhash_incr": lambda: DI.IncrementalSimHashIndex(f"{root}/idx"),
        "q_doc_prefix_incr": lambda: DI.IncrementalPrefixJaccardIndex(
            f"{root}/idx", threshold_num=1, threshold_den=2
        ),
        "q_doc_exact_dedup_incr": lambda: DI.IncrementalExactDedupIndex(
            f"{root}/idx"
        ),
    }
    if name not in mk:
        return None
    idx = mk[name]()
    out = None
    for e in range(3):
        out = idx.process_batch(docs.filter(F.col("doc_id") % 3 == e), e)
        if e < 2:
            out.write.mode("overwrite").parquet(f"{root}/out-{e}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("--twin-emission", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from walex_spark.queries import QUERIES
    from walex_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("walex-plans")
    for name in args.names:
        if args.twin_emission:
            df = _twin_emission(name, spark, args.sf)
            if df is None:
                print(f"no twin-emission builder for {name}", file=sys.stderr)
                return 2
            label = f"{name}.epoch2_emission"
        else:
            df = QUERIES[name](spark, args.sf)
            label = name
        path = os.path.join(args.out, f"{label}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(fmt_plan(df))
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
