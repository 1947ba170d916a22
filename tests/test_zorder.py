"""Z-order layout contract: interleave correctness + the pruning payoff.

The point of the Morton layout is measurable in parquet footers: after
zorder_write, every file's (min, max) range on EACH clustered column
covers a small fraction of that column's global range — so predicates
on either column prune most files. A single-key range layout gives
that for its key only; the other column's per-file ranges stay ~full.
"""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from walex_spark.sinks.zorder import z_value, zorder_write

SF_DIR = "/root/testdata/sf0.001"


def _zv(spark, a, b, bits):
    row = spark.range(1).select(
        z_value([F.lit(a), F.lit(b)], bits).alias("z")
    ).first()
    return row["z"]


def test_z_value_interleaves_bits(spark):
    # a=0b11 owns even positions, b=0b01 odd: z = 0b0111 = 7
    assert _zv(spark, 0b11, 0b01, 2) == 7
    assert _zv(spark, 0, 0, 4) == 0
    # single high bit of each column lands at positions 2b and 2b+1
    assert _zv(spark, 1 << 7, 0, 8) == 1 << 14
    assert _zv(spark, 0, 1 << 7, 8) == 1 << 15


def test_z_value_validates():
    with pytest.raises(ValueError):
        z_value([F.lit(1), F.lit(2)], 40)  # 2*40 > 62 bits
    with pytest.raises(ValueError):
        z_value([F.lit(1)], 0)


def _coverage(files, col):
    """sum of per-file (max-min) over n_files * global range: 1.0 means
    every file spans the whole key range (no pruning possible)."""
    spans, gmin, gmax = [], None, None
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        spans.append(fmax - fmin)
        gmin = fmin if gmin is None else min(gmin, fmin)
        gmax = fmax if gmax is None else max(gmax, fmax)
    return sum(spans) / ((gmax - gmin) * len(spans))


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zord")
    # single-key range clustering: perfect for partkey, blind for suppkey
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(naive)
    )
    zorder_write(li, zord, ["l_partkey", "l_suppkey"], bits=8, n_files=8)

    nf = sorted(glob.glob(f"{naive}/part-*.parquet"))
    zf = sorted(glob.glob(f"{zord}/part-*.parquet"))
    assert len(nf) == 8 and len(zf) == 8

    naive_supp = _coverage(nf, "l_suppkey")
    z_part = _coverage(zf, "l_partkey")
    z_supp = _coverage(zf, "l_suppkey")

    # the single-key layout cannot prune the second column at all
    assert naive_supp > 0.85, naive_supp
    # the z-order layout prunes on BOTH columns: each file covers a
    # bounded rectangle (~1/2 x 1/4 of the key space for 8 files)
    assert z_part < 0.75, z_part
    assert z_supp < 0.6, z_supp
    # and the second column improves by a wide margin over naive
    assert z_supp < 0.7 * naive_supp, (z_supp, naive_supp)


def test_zorder_write_validates(spark, tmp_path):
    df = spark.range(4)
    with pytest.raises(ValueError):
        zorder_write(df, str(tmp_path / "x"), [])
