"""Z-order (Morton-curve) clustered layout for multi-column pruning.

Range-clustering on ONE key (sinks/compact.py) gives perfect file
pruning for that key and none for any other. When scans filter on two
independent keys (`l_partkey` AND `l_suppkey`), the classic fix is to
sort by the interleaved-bit Morton code: files then cover small
rectangles of the (a, b) key space, so parquet min/max footer stats
prune most files for predicates on EITHER column — the layout Delta's
`OPTIMIZE ZORDER BY` builds, expressed here over plain parquet.

Everything is JVM column algebra: each column is min-max-scaled to
``bits`` bits (the only data pass before the write computes the
per-column min/max — a metadata-sized collect, same class as IVF
centroids), the scaled values interleave via shift/and/or expressions
(whole-stage codegen'd, no UDF), and the write is one
``repartitionByRange`` shuffle on the z-value. At 100 TB the shuffle
is the honest cost of re-clustering; it is paid once per maintenance
cycle and amortized over every subsequent pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["z_value", "zorder_write"]


def z_value(scaled_cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of already-scaled non-negative
    integer columns into a Morton code (column i owns bit positions
    ``i, i+n, i+2n, ...``)."""
    n = len(scaled_cols)
    if not 1 <= bits <= 62 // n:
        raise ValueError(f"bits={bits} out of range for {n} columns")
    out = F.lit(0).cast(T.LongType())
    for i, c in enumerate(scaled_cols):
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
                ).cast(T.LongType())
            )
    return out


def scale_to_bits(c: Column, vmin: int, vmax: int, bits: int) -> Column:
    """Min-max scale an integer column onto [0, 2^bits - 1]. The scale
    factor multiplies BEFORE dividing so the double rounding is the
    same single IEEE division in any engine."""
    top = (1 << bits) - 1
    if vmax <= vmin:
        return F.lit(0).cast(T.LongType())
    return F.floor(
        ((c - F.lit(vmin)) * F.lit(top)).cast(T.DoubleType())
        / F.lit(float(vmax - vmin))
    ).cast(T.LongType())


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet range-partitioned on the Morton code of
    ``cols`` — one shuffle, ``n_files`` files covering disjoint
    z-ranges (small key-space rectangles)."""
    if not cols:
        raise ValueError("zorder_write needs at least one column")
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).first()
    scaled = [
        scale_to_bits(F.col(c), stats[f"min_{c}"], stats[f"max_{c}"], bits)
        for c in cols
    ]
    z = z_value(scaled, bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .select(*df.columns)
    )
    out.write.mode("overwrite").parquet(path)
