"""Deterministic Bloom-filter semi-join: prune the big side before it
shuffles.

A semi-join of a 100 TB fact table against a filtered dimension
shuffles every fact row that MIGHT match. Engines fix this with
runtime filters: build a compact membership sketch of the dimension
keys, push it into the fact scan, and let the exact join only see the
survivors. This module builds that filter explicitly, deterministic
across engines and restarts:

  build  — bit positions computed with the SAME JVM md5 expressions
           the probe uses (build/probe cannot disagree on the hash),
           deduped by one small shuffle; the driver collects at most
           min(n*k, m_bits) integers — bounded by the bitmap size,
           metadata-sized like IVF centroids;
  probe  — pure JVM expression: md5 double hashing
           (pos_j = h1 + j*h2 mod m, Kirsch-Mitzenmacher), the bitmap
           shipped as ONE array<long> literal indexed with
           F.get + shift/and — no UDF, no broadcast join, and the
           filter sits below the shuffle in the plan;
  verify — the exact semi-join afterwards removes the Bloom's false
           positives, so results are EXACT; the sketch only decides
           how many rows reach the shuffle.

The hash input is the key's canonical decimal string; `_positions`
is the pure-python reference of the same double hash (tested equal to
the JVM expressions) for callers that need to probe a shipped bitmap
outside Spark. False-positive rate follows the standard
(1 - e^{-kn/m})^k — size m_bits ~ 10-16 bits/key for ~1% at k=4.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["build_bloom", "bloom_might_contain", "bloom_semi_join"]

_SALT = "bloom"


def _positions(value: str, m_bits: int, k: int) -> list[int]:
    h = hashlib.md5((_SALT + value).encode()).hexdigest()
    h1 = int(h[:8], 16)
    h2 = int(h[8:16], 16)
    return [(h1 + j * h2) % m_bits for j in range(k)]


def _hash_cols(col: Column) -> tuple[Column, Column]:
    h = F.md5(F.concat(F.lit(_SALT), col.cast(T.StringType())))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast(T.LongType())
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast(T.LongType())
    return h1, h2


def build_bloom(
    df: DataFrame, col: str, m_bits: int = 1 << 16, k: int = 4
) -> list[int]:
    """Distributed Bloom build → bitmap as signed int64 words.

    The bit POSITIONS are computed with the same JVM md5 expressions
    the probe uses (no Python workers to spin up, and build/probe can
    never disagree on the hash); one small shuffle dedups them and
    the driver collects at most min(n*k, m_bits) integers — bounded
    by the bitmap size, never by the key count.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")

    h1, h2 = _hash_cols(F.col(col))
    pos = F.explode(
        F.array(*[(h1 + F.lit(j) * h2) % F.lit(m_bits) for j in range(k)])
    )
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(pos.alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    col: Column, words: list[int], m_bits: int, k: int = 4
) -> Column:
    """JVM-side probe: true iff every hash position's bit is set.

    The k probe positions all derive from ONE md5 — callers on a hot
    path should prefer materializing the two hash halves in a
    projection first (as bloom_semi_join does) rather than relying on
    codegen subexpression elimination inside a Filter."""
    h1, h2 = _hash_cols(col)
    return _probe_cond(h1, h2, words, m_bits, k) & col.isNotNull()


def _probe_cond(
    h1: Column, h2: Column, words: list[int], m_bits: int, k: int
) -> Column:
    # ONE string literal parsed by from_json, constant-folded to a
    # single array constant — m/64 individual Literal nodes would put
    # Catalyst analysis back on the IVF slow path this repo already
    # paid for once (similarity.py's r05 rewrite)
    bitmap = F.from_json(
        F.lit(json.dumps(words)), "array<bigint>"
    )
    cond = None
    for j in range(k):
        pos = (h1 + F.lit(j) * h2) % F.lit(m_bits)
        word = F.get(bitmap, (pos / F.lit(64)).cast(T.IntegerType()))
        # getbit takes a COLUMN position (shiftright only accepts a
        # Python int shift amount)
        bit = (
            F.call_function(
                "getbit", word, (pos % F.lit(64)).cast(T.IntegerType())
            )
            == F.lit(1)
        )
        cond = bit if cond is None else (cond & bit)
    return cond


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """EXACT ``left SEMI JOIN right`` with a Bloom pre-filter on the
    left: only rows passing the sketch reach the shuffle; the semi-join
    then discards the sketch's false positives.

    The md5 halves are materialized in a projection BELOW the filter
    so the hash runs once per row regardless of filter-side codegen
    CSE (measured ~15% off the probe at sf0.1)."""
    words = build_bloom(right, right_col, m_bits, k)
    h1, h2 = _hash_cols(F.col(left_col))
    pre = (
        left.withColumn("__bloom_h1", h1)
        .withColumn("__bloom_h2", h2)
        .filter(
            _probe_cond(
                F.col("__bloom_h1"), F.col("__bloom_h2"), words, m_bits, k
            )
            & F.col(left_col).isNotNull()
        )
        .drop("__bloom_h1", "__bloom_h2")
    )
    keys = right.select(F.col(right_col).alias(left_col)).distinct()
    return pre.join(keys, on=left_col, how="left_semi")
