"""Column profiling — the data-quality summary a pipeline runs before
training on a new table (null rates, cardinalities, numeric ranges).

No reference counterpart (walex routes events, it never inspects a
table — SURVEY.md §2.8); this is driver-mandated training-pipeline
surface.

Scale posture (100 TB): the whole profile is ONE aggregation pass.
With ``exact=False`` (the default for scale) distinct counts use
HyperLogLog (`approx_count_distinct`) so the pass is a plain
map-side-combinable aggregate — one shuffle of a handful of sketch
bytes per column. ``exact=True`` (used by the oracle-checked query at
small SF) plans Spark's Expand: the input is replicated once per
distinct-counted column, which is exactly what you should NOT do at
100 TB — the flag documents the trade instead of hiding it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_num, max_num).

    min/max are surfaced for numeric columns only (as double — exact
    for the integral/selection cases, and min/max never interpolate);
    string/other columns carry NULL there rather than forcing a lossy
    cross-type repr. Everything computes in a single agg over the
    input; the per-column result rows are assembled driver-free with
    an inline array + explode of the one aggregate row.
    """
    if cols is None:
        cols = df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if exact:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast(T.DoubleType()).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast(T.DoubleType()).alias(f"__max_{c}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (
                    F.col(f"__min_{c}")
                    if isinstance(fields[c], _NUMERIC)
                    else F.lit(None).cast(T.DoubleType())
                ).alias("min_num"),
                (
                    F.col(f"__max_{c}")
                    if isinstance(fields[c], _NUMERIC)
                    else F.lit(None).cast(T.DoubleType())
                ).alias("max_num"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
