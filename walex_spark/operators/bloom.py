"""Deterministic Bloom-filter semi-join: prune the big side before it
shuffles.

A semi-join of a 100 TB fact table against a filtered dimension
shuffles every fact row that MIGHT match. Engines fix this with
runtime filters: build a compact membership sketch of the dimension
keys, push it into the fact scan, and let the exact join only see the
survivors. This module builds that filter explicitly, deterministic
across engines and restarts:

  build  — per-partition bitmap via Arrow-batched mapInPandas
           (zero shuffle), OR-merged on the driver — the collect is
           m/8 bytes per partition, metadata-sized like IVF centroids;
  probe  — pure JVM expression: md5 double hashing
           (pos_j = h1 + j*h2 mod m, Kirsch-Mitzenmacher), the bitmap
           shipped as ONE array<long> literal indexed with
           element_at + shift/and — no UDF, no broadcast join, and the
           filter sits below the shuffle in the plan;
  verify — the exact semi-join afterwards removes the Bloom's false
           positives, so results are EXACT; the sketch only decides
           how many rows reach the shuffle.

The hash input is the key's canonical decimal string, so Python
(build) and the JVM (probe) hash identical bytes; md5 is bit-stable
everywhere. False-positive rate follows the standard
(1 - e^{-kn/m})^k — size m_bits ~ 10-16 bits/key for ~1% at k=4.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import pandas as pd
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


def build_bloom(
    df: DataFrame, col: str, m_bits: int = 1 << 16, k: int = 4
) -> list[int]:
    """Distributed Bloom build → bitmap as signed int64 words.

    Each partition builds its own bitmap (constant memory, no
    shuffle); the driver ORs the partition bitmaps — one m/8-byte row
    per partition crosses to the driver, never data rows.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    n_bytes = m_bits // 8

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = bytearray(n_bytes)
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                for pos in _positions(str(v), m_bits, k):
                    bm[pos // 8] |= 1 << (pos % 8)
        yield pd.DataFrame({"bitmap": [bytes(bm)]})

    merged = bytearray(n_bytes)
    for row in df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        part, schema="bitmap binary"
    ).collect():
        for i, b in enumerate(row["bitmap"]):
            merged[i] |= b
    words = []
    for w in range(m_bits // 64):
        word = int.from_bytes(merged[w * 8 : (w + 1) * 8], "little")
        words.append(word - (1 << 64) if word >= (1 << 63) else word)
    return words


def bloom_might_contain(
    col: Column, words: list[int], m_bits: int, k: int = 4
) -> Column:
    """JVM-side probe: true iff every hash position's bit is set."""
    h = F.md5(F.concat(F.lit(_SALT), col.cast(T.StringType())))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast(T.LongType())
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast(T.LongType())
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
    return cond & col.isNotNull()


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
    then discards the sketch's false positives."""
    words = build_bloom(right, right_col, m_bits, k)
    pre = left.filter(
        bloom_might_contain(F.col(left_col), words, m_bits, k)
    )
    keys = right.select(F.col(right_col).alias(left_col)).distinct()
    return pre.join(keys, on=left_col, how="left_semi")
