"""Physical-plan audit: turn `explain` output into assertable facts.

The reference has no optimizer to audit (SURVEY.md §4.1); in the Spark
rebuild the optimizer IS the execution strategy, so plan shape is part
of the engine's contract: filters must reach the parquet scan, column
pruning must shrink ReadSchema, small dims must broadcast, and a
query's shuffle count must stay what the design says it is — at 100 TB
an accidental extra Exchange or a silently-degraded broadcast join is
the difference between minutes and hours. tests/test_plans.py pins
these properties for the headline queries so regressions fail CI, the
same way value regressions do.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ScanInfo:
    location: str
    read_columns: list[str]
    pushed_filters: list[str]


@dataclass
class PlanReport:
    scans: list[ScanInfo] = field(default_factory=list)
    shuffle_exchanges: int = 0
    broadcast_exchanges: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    text: str = ""

    def scan_for(self, table: str) -> ScanInfo:
        for s in self.scans:
            if table in s.location:
                return s
        raise KeyError(f"no parquet scan of {table!r} in plan")


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(df: DataFrame) -> PlanReport:
    """Parse `explain("formatted")` into a PlanReport."""
    text = formatted_plan(df)
    report = PlanReport(text=text)
    # tree section: count operators (the detail section repeats names)
    tree = text.split("\n\n", 1)[0]
    report.shuffle_exchanges = len(re.findall(r"\bExchange\b", tree))
    report.broadcast_exchanges = len(re.findall(r"\bBroadcastExchange\b", tree))
    report.broadcast_hash_joins = len(re.findall(r"\bBroadcastHashJoin\b", tree))
    report.sort_merge_joins = len(re.findall(r"\bSortMergeJoin\b", tree))
    report.nested_loop_joins = len(re.findall(r"\bBroadcastNestedLoopJoin\b", tree))

    for block in re.split(r"\n(?=\(\d+\) )", text):
        if not re.match(r"\(\d+\) Scan parquet", block):
            continue
        loc = re.search(r"Location: \S+ \[(.*?)\]", block)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*)>", block)
        cols = []
        if schema:
            cols = [c.split(":")[0] for c in re.split(r",(?![^<]*>)", schema.group(1)) if c]
        report.scans.append(
            ScanInfo(
                location=loc.group(1) if loc else "",
                read_columns=cols,
                pushed_filters=[p.strip() for p in pushed.group(1).split(",")]
                if pushed and pushed.group(1)
                else [],
            )
        )
    return report
