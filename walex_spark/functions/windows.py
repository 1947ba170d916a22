"""Window-function identities Spark's analyzer rejects directly.

Spark refuses ``COUNT(DISTINCT x) OVER (PARTITION BY p)`` (DISTINCT
is unsupported in window aggregates), but the value is expressible
with the classic dense_rank identity — all passes share the single
partition shuffle, so the rewrite costs no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T


def count_distinct_over(col: str, partition_by: list[str]) -> Column:
    """``COUNT(DISTINCT col) OVER (PARTITION BY partition_by)``.

    Identity: max(dense_rank ordered by col) counts the distinct
    tie-groups in the partition; NULLs form a tie-group dense_rank
    counts but COUNT(DISTINCT) skips, hence the -1 correction when
    any NULL is present.
    """
    p: WindowSpec = Window.partitionBy(*partition_by)
    dr = F.dense_rank().over(p.orderBy(col))
    has_null = F.max(F.col(col).isNull().cast("int")).over(p)
    return (F.max(dr).over(p) - has_null).cast(T.LongType())
