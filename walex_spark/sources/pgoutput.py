"""pgoutput binary decode: raw logical-replication frames → the
canonical change envelope (SURVEY.md §2.3).

Message formats follow the public PostgreSQL logical-replication
protocol documentation (protocol version 1): Begin 'B', Commit 'C',
Origin 'O', Relation 'R', Type 'Y', Insert 'I', Update 'U', Delete 'D',
Truncate 'T', with TupleData cells 'n' (NULL) / 'u' (unchanged TOAST) /
't' (text). Parity surface: lib/walex/decoder/decoder.ex:67-239 (same
protocol, independent implementation).

Spark-first decomposition — the reference decodes in one serial process;
here the work splits into the natural parallel/serial parts:

  1. ``decode_frames``  — mapInPandas over the binary payload column:
     embarrassingly parallel, Arrow-batched, no state. Relation/Type
     registry entries are collected FIRST from the (tiny) 'R'/'Y'
     frames and broadcast into the decode closure — the "slowly-
     changing broadcast state" form of publisher.ex:79-95's registry.
  2. ``stamp_transactions`` — BEGIN/COMMIT bracketing becomes a
     carry-forward window over the frame order. WAL is inherently
     serial (SURVEY.md §7.4), so this single metadata window runs on
     one partition; everything downstream repartitions freely.

Unknown relation ids are dropped, matching publisher.ex:124-126.
"""

from __future__ import annotations

import struct
from bisect import bisect_right
from datetime import datetime, timedelta, timezone
from typing import Any, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from walex_spark.functions.pg_types import OID_TO_NAME
from walex_spark.model import UNCHANGED_TOAST

PG_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)


def _cstring(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _pg_ts(micros: int) -> datetime:
    return (PG_EPOCH + timedelta(microseconds=micros)).replace(tzinfo=None)


def _tuple_data(buf: bytes, pos: int) -> tuple[list[str | None], int]:
    """TupleData: int16 ncols then per-cell 'n' | 'u' | 't'<int32 len>."""
    (ncols,) = struct.unpack_from(">H", buf, pos)
    pos += 2
    cells: list[str | None] = []
    for _ in range(ncols):
        kind = buf[pos : pos + 1]
        pos += 1
        if kind == b"n":
            cells.append(None)
        elif kind == b"u":
            cells.append(UNCHANGED_TOAST)
        elif kind == b"t":
            (ln,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            cells.append(buf[pos : pos + ln].decode("utf-8"))
            pos += ln
        else:
            raise ValueError(f"unknown TupleData cell kind {kind!r}")
    return cells, pos


def decode_message(buf: bytes) -> dict[str, Any]:
    """One pgoutput frame → a plain dict (tag-dependent fields).

    Mirrors the dispatch surface of decoder.ex:67-216; built from the
    PostgreSQL protocol docs, lenient only in that unknown tags return
    {'op': 'UNSUPPORTED'} like the reference's Unsupported struct.
    """
    tag = buf[0:1]
    if tag == b"B":
        final_lsn, ts, xid = struct.unpack_from(">QQI", buf, 1)
        return {"op": "BEGIN", "final_lsn": final_lsn, "commit_ts": _pg_ts(ts), "xid": xid}
    if tag == b"C":
        _flags, commit_lsn, end_lsn, ts = struct.unpack_from(">BQQQ", buf, 1)
        return {
            "op": "COMMIT",
            "commit_lsn": commit_lsn,
            "end_lsn": end_lsn,
            "commit_ts": _pg_ts(ts),
        }
    if tag == b"O":
        (origin_lsn,) = struct.unpack_from(">Q", buf, 1)
        name, _ = _cstring(buf, 9)
        return {"op": "ORIGIN", "origin_lsn": origin_lsn, "origin_name": name}
    if tag == b"R":
        (rel_id,) = struct.unpack_from(">I", buf, 1)
        pos = 5
        namespace, pos = _cstring(buf, pos)
        name, pos = _cstring(buf, pos)
        replica_identity = buf[pos : pos + 1].decode()
        pos += 1
        (ncols,) = struct.unpack_from(">H", buf, pos)
        pos += 2
        cols = []
        for _ in range(ncols):
            flags = buf[pos]
            pos += 1
            cname, pos = _cstring(buf, pos)
            type_oid, type_mod = struct.unpack_from(">Ii", buf, pos)
            pos += 8
            cols.append(
                {
                    "name": cname,
                    "type": OID_TO_NAME.get(type_oid, str(type_oid)),
                    "is_key": bool(flags & 1),
                    "type_modifier": type_mod,
                }
            )
        return {
            "op": "RELATION",
            "relation_id": rel_id,
            "namespace": namespace or "pg_catalog",
            "name": name,
            "replica_identity": {"d": "default", "n": "nothing", "f": "all_columns", "i": "index"}[
                replica_identity
            ],
            "columns": cols,
        }
    if tag == b"Y":
        (type_id,) = struct.unpack_from(">I", buf, 1)
        pos = 5
        namespace, pos = _cstring(buf, pos)
        name, _ = _cstring(buf, pos)
        return {"op": "TYPE", "type_id": type_id, "namespace": namespace, "name": name}
    if tag == b"I":
        (rel_id,) = struct.unpack_from(">I", buf, 1)
        assert buf[5:6] == b"N"
        cells, _ = _tuple_data(buf, 6)
        return {"op": "INSERT", "relation_id": rel_id, "new": cells}
    if tag == b"U":
        (rel_id,) = struct.unpack_from(">I", buf, 1)
        pos = 5
        old = key = None
        marker = buf[pos : pos + 1]
        if marker in (b"K", b"O"):
            cells, pos = _tuple_data(buf, pos + 1)
            if marker == b"K":
                key = cells
            else:
                old = cells
            marker = buf[pos : pos + 1]
        assert marker == b"N"
        new, _ = _tuple_data(buf, pos + 1)
        return {"op": "UPDATE", "relation_id": rel_id, "new": new, "old": old, "key": key}
    if tag == b"D":
        (rel_id,) = struct.unpack_from(">I", buf, 1)
        marker = buf[5:6]
        cells, _ = _tuple_data(buf, 6)
        out = {"op": "DELETE", "relation_id": rel_id, "old": None, "key": None}
        if marker == b"K":
            out["key"] = cells
        else:
            out["old"] = cells
        return out
    if tag == b"T":
        nrel, options = struct.unpack_from(">IB", buf, 1)
        ids = struct.unpack_from(f">{nrel}I", buf, 6)
        return {"op": "TRUNCATE", "relation_ids": list(ids), "options": options}
    return {"op": "UNSUPPORTED", "tag": tag.decode("latin1")}


# -- frame encoders ---------------------------------------------------------
# The inverse direction (dicts → wire frames), used by tests and by the
# round-trip correctness query; same public protocol layout as above.


def _enc_cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _enc_cell(v) -> bytes:
    if v is None:
        return b"n"
    if v == UNCHANGED_TOAST:
        return b"u"
    b = str(v).encode()
    return b"t" + struct.pack(">I", len(b)) + b


def _enc_tuple(cells) -> bytes:
    return struct.pack(">H", len(cells)) + b"".join(_enc_cell(c) for c in cells)


def encode_begin(lsn: int, ts_micros_pg: int, xid: int) -> bytes:
    return b"B" + struct.pack(">QQI", lsn, ts_micros_pg, xid)


def encode_commit(lsn: int, ts_micros_pg: int) -> bytes:
    # end_lsn is the next byte past the commit record (+8 here, the
    # synthetic record length); uint64-wrap like pg_lsn arithmetic so
    # a max-valued lsn can't overflow the pack (hypothesis-found edge)
    return b"C" + struct.pack(
        ">BQQQ", 0, lsn, (lsn + 8) & 0xFFFFFFFFFFFFFFFF, ts_micros_pg
    )


def encode_relation(
    rel_id: int,
    name: str,
    cols: list[tuple[str, int, bool]],
    namespace: str = "public",
    replica_identity: str = "d",
) -> bytes:
    body = struct.pack(">I", rel_id) + _enc_cstr(namespace) + _enc_cstr(name)
    body += replica_identity.encode() + struct.pack(">H", len(cols))
    for cname, oid, is_key in cols:
        body += struct.pack(">B", 1 if is_key else 0) + _enc_cstr(cname)
        body += struct.pack(">Ii", oid, -1)
    return b"R" + body


def encode_insert(rel_id: int, cells) -> bytes:
    return b"I" + struct.pack(">I", rel_id) + b"N" + _enc_tuple(cells)


def encode_update(rel_id: int, new, old=None, key=None) -> bytes:
    body = struct.pack(">I", rel_id)
    if key is not None:
        body += b"K" + _enc_tuple(key)
    if old is not None:
        body += b"O" + _enc_tuple(old)
    return b"U" + body + b"N" + _enc_tuple(new)


def encode_delete(rel_id: int, old=None, key=None) -> bytes:
    body = struct.pack(">I", rel_id)
    if key is not None:
        return b"D" + body + b"K" + _enc_tuple(key)
    return b"D" + body + b"O" + _enc_tuple(old)


def encode_truncate(rel_ids, options: int = 0) -> bytes:
    return b"T" + struct.pack(">IB", len(rel_ids), options) + struct.pack(
        f">{len(rel_ids)}I", *rel_ids
    )


def collect_registry(
    frames: DataFrame, payload_col: str = "payload", idx_col: str = "frame_idx"
) -> dict[int, tuple[list[int], list[dict]]]:
    """Pass 1: Relation/Type frames → broadcastable VERSIONED registry:
    ``{relation_id: ([valid_from_idx...], [relation_msg...])}`` with
    ascending validity bounds.

    'R'/'Y' frames are a vanishing fraction of the stream (one per
    table per session/schema-change), so collecting them to the driver
    is metadata-sized regardless of stream volume. Keeping every
    version (not last-wins) means a Relation re-sent after a mid-stream
    schema change applies only to frames AFTER it — earlier frames
    decode against the schema that was current when they were written,
    exactly like the reference's sequential registry updates
    (publisher.ex:79-95). Custom-type registrations ('Y') accumulate in
    stream order and resolve OIDs for relation versions collected after
    them."""
    tagged = frames.filter(
        F.substring(F.col(payload_col), 1, 1).isin([bytes([82]), bytes([89])])  # R, Y
    )
    rows = sorted(
        (row[0], bytes(row[1]))
        for row in tagged.select(idx_col, payload_col).collect()
    )
    custom_types: dict[str, str] = {}
    registry: dict[int, tuple[list[int], list[dict]]] = {}
    for idx, buf in rows:
        msg = decode_message(buf)
        if msg["op"] == "TYPE":
            custom_types[str(msg["type_id"])] = msg["name"]
        elif msg["op"] == "RELATION":
            for col in msg["columns"]:
                col["type"] = custom_types.get(col["type"], col["type"])
            bounds, versions = registry.setdefault(msg["relation_id"], ([], []))
            bounds.append(idx)
            versions.append(msg)
    return registry


def registry_lookup(registry: dict, rel_id: int, frame_idx: int) -> dict | None:
    """Relation version in effect at ``frame_idx`` — or the single
    un-versioned dict when the caller supplied an out-of-band schema.
    None when the relation is unknown (or not yet announced at this
    position in the stream): the frame is skipped, like the reference's
    unknown-relation drop (publisher.ex:124-126)."""
    entry = registry.get(rel_id)
    if entry is None:
        return None
    if isinstance(entry, dict):  # out-of-band schema, version-agnostic
        return entry
    bounds, versions = entry
    pos = bisect_right(bounds, frame_idx) - 1
    return versions[pos] if pos >= 0 else None


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("frame_idx", T.LongType()),
        T.StructField("sub_idx", T.IntegerType()),  # TRUNCATE fan-out position
        T.StructField("op", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("is_key", T.BooleanType()),
                        T.StructField("type_modifier", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField("record", T.MapType(T.StringType(), T.StringType())),
        T.StructField("old_record", T.MapType(T.StringType(), T.StringType())),
        T.StructField("key_record", T.MapType(T.StringType(), T.StringType())),
        T.StructField("commit_ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("xid", T.LongType()),
    ]
)


def decode_frames(
    frames: DataFrame,
    registry: dict,
    payload_col: str = "payload",
    idx_col: str = "frame_idx",
) -> DataFrame:
    """Pass 2: parallel decode of all frames against the broadcast
    registry (Arrow-batched mapInPandas; no shuffle). Emits BEGIN/COMMIT
    marker rows (consumed by stamp_transactions) and data rows with
    positionally-zipped record maps (data_tuple_to_map,
    publisher.ex:247-279). Each frame resolves the relation version in
    effect at ITS stream position (registry_lookup) — a mid-stream
    schema change never re-decodes earlier frames against the newer
    schema. Unknown / not-yet-announced relations are skipped
    (publisher.ex:124-126)."""

    def zip_cells(rel: dict, cells: list | None):
        if cells is None:
            return None
        cols = rel["columns"]
        if len(cells) != len(cols):
            # halt like the reference (publisher.ex zips positionally and
            # crashes the supervisor on shape drift): silently returning
            # NULL here would lose data without signal after a mid-stream
            # schema change the collected registry didn't see
            raise ValueError(
                f"pgoutput tuple arity {len(cells)} != "
                f"{rel['namespace']}.{rel['name']} registry arity {len(cols)}"
                " — mid-stream schema change? re-collect the relation registry"
            )
        return {c["name"]: v for c, v in zip(cols, cells)}

    def decode_part(batches: Iterator) -> Iterator:
        # Columnar accumulation: 12 parallel lists instead of a dict per
        # row — pd.DataFrame(list-of-dicts) was the hot spot (~2× the
        # whole decode). BEGIN/COMMIT (the bulk of a txn-per-row stream)
        # parse inline without the decode_message dict, and commit_ts
        # stays integer µs until one vectorized to_datetime at the end.
        import pandas as pd
        import struct as _s

        names = [f.name for f in _DECODED_SCHEMA.fields]
        for pdf in batches:
            c_idx: list = []
            c_sub: list = []
            c_op: list = []
            c_schema: list = []
            c_table: list = []
            c_cols: list = []
            c_rec: list = []
            c_old: list = []
            c_key: list = []
            c_ts: list = []
            c_lsn: list = []
            c_xid: list = []
            for idx, payload in zip(
                pdf[idx_col].to_numpy(), pdf[payload_col].to_numpy()
            ):
                buf = bytes(payload)
                tag = buf[0]
                if tag == 66:  # 'B'
                    final_lsn, ts, xid = _s.unpack_from(">QQI", buf, 1)
                    c_idx.append(idx); c_sub.append(0); c_op.append("BEGIN")
                    c_schema.append(None); c_table.append(None); c_cols.append(None)
                    c_rec.append(None); c_old.append(None); c_key.append(None)
                    c_ts.append(ts); c_lsn.append(final_lsn); c_xid.append(xid)
                    continue
                if tag == 67:  # 'C'
                    _flags, commit_lsn, _end, ts = _s.unpack_from(">BQQQ", buf, 1)
                    c_idx.append(idx); c_sub.append(0); c_op.append("COMMIT")
                    c_schema.append(None); c_table.append(None); c_cols.append(None)
                    c_rec.append(None); c_old.append(None); c_key.append(None)
                    c_ts.append(ts); c_lsn.append(commit_lsn); c_xid.append(None)
                    continue
                # 'I' and the N-only 'U' form (the overwhelmingly common
                # data frames) parse inline; every other shape falls
                # through to the golden-tested decode_message dispatch
                if tag == 73 and buf[5] == 78:  # 'I' — rel_id, 'N', tuple
                    (rel_id,) = _s.unpack_from(">I", buf, 1)
                    rel = registry_lookup(registry, rel_id, idx)
                    if rel is None:
                        continue
                    cells, _ = _tuple_data(buf, 6)
                    c_idx.append(idx); c_sub.append(0); c_op.append("INSERT")
                    c_schema.append(rel["namespace"]); c_table.append(rel["name"])
                    c_cols.append(rel["columns"])
                    c_rec.append(zip_cells(rel, cells))
                    c_old.append(None); c_key.append(None)
                    c_ts.append(None); c_lsn.append(None); c_xid.append(None)
                    continue
                if tag == 85 and buf[5] == 78:  # 'U' without old/key tuple
                    (rel_id,) = _s.unpack_from(">I", buf, 1)
                    rel = registry_lookup(registry, rel_id, idx)
                    if rel is None:
                        continue
                    cells, _ = _tuple_data(buf, 6)
                    c_idx.append(idx); c_sub.append(0); c_op.append("UPDATE")
                    c_schema.append(rel["namespace"]); c_table.append(rel["name"])
                    c_cols.append(rel["columns"])
                    c_rec.append(zip_cells(rel, cells))
                    c_old.append(None); c_key.append(None)
                    c_ts.append(None); c_lsn.append(None); c_xid.append(None)
                    continue
                msg = decode_message(buf)
                op = msg["op"]
                if op in ("UPDATE", "DELETE"):
                    rel = registry_lookup(registry, msg["relation_id"], idx)
                    if rel is None:
                        continue
                    c_idx.append(idx); c_sub.append(0); c_op.append(op)
                    c_schema.append(rel["namespace"]); c_table.append(rel["name"])
                    c_cols.append(rel["columns"])
                    c_rec.append(zip_cells(rel, msg.get("new")))
                    c_old.append(zip_cells(rel, msg.get("old")))
                    c_key.append(zip_cells(rel, msg.get("key")))
                    c_ts.append(None); c_lsn.append(None); c_xid.append(None)
                elif op == "TRUNCATE":
                    for sub, rid in enumerate(msg["relation_ids"]):
                        rel = registry_lookup(registry, rid, idx)
                        if rel is None:
                            continue
                        c_idx.append(idx); c_sub.append(sub); c_op.append("TRUNCATE")
                        c_schema.append(rel["namespace"]); c_table.append(rel["name"])
                        c_cols.append(None); c_rec.append(None); c_old.append(None)
                        c_key.append(None); c_ts.append(None); c_lsn.append(None)
                        c_xid.append(None)
                # RELATION/TYPE/ORIGIN/UNSUPPORTED: not data rows
            ts_col = pd.Timestamp("2000-01-01") + pd.to_timedelta(
                pd.Series(c_ts, dtype="float64"), unit="us"
            )
            # force object dtype on every nullable column: equal-length
            # nested lists would collapse into a 2-D ndarray, and all-None
            # columns (e.g. record in a BEGIN/COMMIT-only partition) would
            # infer float64 NaN — both break Arrow conversion
            obj = lambda v: pd.Series(v, dtype="object")
            yield pd.DataFrame(
                dict(
                    zip(
                        names,
                        (c_idx, c_sub, c_op, obj(c_schema), obj(c_table),
                         obj(c_cols), obj(c_rec), obj(c_old), obj(c_key),
                         ts_col, obj(c_lsn), obj(c_xid)),
                    )
                )
            )

    return frames.mapInPandas(decode_part, _DECODED_SCHEMA)


def stamp_transactions(decoded: DataFrame, block_size: int = 1 << 16) -> DataFrame:
    """BEGIN/COMMIT bracketing → per-change (xid, commit_ts, lsn,
    change_idx), emitted as the canonical envelope.

    The BEGIN carry-forward is a two-pass prefix scan, so a 100 TB WAL
    backfill never serializes on one partition:

      1. frames bucket into fixed ``block_size`` ranges of frame_idx;
         within each block a partitioned window carries the last BEGIN
         forward — fully parallel across blocks;
      2. each block's LAST BEGIN aggregates to one row per block
         (metadata-sized: ≤ n_frames/block_size rows); a serial window
         over that tiny table computes the carry entering each block,
         which broadcast-joins back and fills rows before their block's
         first BEGIN.

    A microbatch-sized input (< block_size frames) collapses to a
    single block — pass 2 degenerates to a one-row no-op. Only the
    narrow metadata projection (frame_idx, op, xid, ts, lsn) flows
    through the scan; wide rows (record maps, column arrays) rejoin the
    stamped metadata on (frame_idx, sub_idx), a plain parallel
    equi-join. Only changes of COMMITTED transactions survive (an
    unterminated tail is dropped, like the reference on restart)."""
    # ONE explicit hash exchange on __blk, shared by its three plan
    # consumers (the local carry window, the per-block last-BEGIN
    # aggregate, and the block-list distinct): each keyed operation
    # below runs on the already-established partitioning, so exchange
    # reuse collapses what used to be three independent shuffles of
    # the metadata projection into one.
    meta = (
        decoded.select(
            "frame_idx", "sub_idx", "op", "xid", "commit_ts", "lsn"
        )
        .withColumn("__blk", (F.col("frame_idx") / F.lit(block_size)).cast("long"))
        .repartition(
            decoded.sparkSession.sparkContext.defaultParallelism, F.col("__blk")
        )
    )
    begin = F.when(F.col("op") == "BEGIN", F.struct("xid", "commit_ts", "lsn"))
    wloc = Window.partitionBy("__blk").orderBy("frame_idx", "sub_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = meta.withColumn("__txn_loc", F.last(begin, ignorenulls=True).over(wloc))
    # pass 2: last BEGIN per block (tiny) → carry entering each block
    blk_begin = (
        meta.filter(F.col("op") == "BEGIN")
        .groupBy("__blk")
        .agg(
            F.max_by(
                F.struct("xid", "commit_ts", "lsn"),
                F.struct("frame_idx", "sub_idx"),
            ).alias("__blk_begin")
        )
    )
    wblk = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        meta.select("__blk")
        .distinct()
        .join(blk_begin, "__blk", "left")
        .withColumn("__carry", F.last("__blk_begin", ignorenulls=True).over(wblk))
        .select("__blk", "__carry")
    )
    # the stamped metadata feeds TWO consumers (the committed-xid set
    # and the data-row stamp), and its subtree tops out below a
    # broadcast join — exchange reuse cannot dedup it, so without the
    # checkpoint the whole carry pipeline executed once per consumer
    # (it appeared twice in the physical plan). Same narrow-projection
    # bound as the decoded checkpoint above: O(input frames) metadata
    # columns only, microbatch-bounded in streaming.
    stamped = (
        local.join(F.broadcast(carry), "__blk")
        .withColumn(
            "__txn", F.coalesce(F.col("__txn_loc"), F.col("__carry"))
        )
        .localCheckpoint(eager=False)
    )
    committed = (
        stamped.filter(F.col("op") == "COMMIT")
        .select(F.col("__txn.xid").alias("c_xid"))
        .distinct()
    )
    data_meta = stamped.filter(~F.col("op").isin("BEGIN", "COMMIT"))
    # no broadcast hint: committed is one row per txn — microbatch-tiny
    # in streaming (AQE broadcasts it), but WAL-sized on a backfill
    # where a forced broadcast would OOM; the xid equi-join lets AQE
    # pick per run
    data_meta = data_meta.join(
        committed, data_meta["__txn.xid"] == committed["c_xid"], "left_semi"
    )
    wtxn = Window.partitionBy("__txn.xid").orderBy("frame_idx", "sub_idx")
    data_meta = data_meta.select(
        F.col("frame_idx").alias("m_frame_idx"),
        F.col("sub_idx").alias("m_sub_idx"),
        F.col("__txn.commit_ts").alias("m_commit_ts"),
        # bitwise split, not division: double math would lose precision
        # past 2^53 and a real WAL position exceeds 2^31 routinely
        F.shiftrightunsigned(F.col("__txn.lsn"), 32).alias("m_lsn_hi"),
        F.col("__txn.lsn").bitwiseAND(F.lit(4294967295)).alias("m_lsn_lo"),
        F.col("__txn.xid").alias("m_xid"),
        (F.row_number().over(wtxn) - F.lit(1)).alias("m_change_idx"),
    )
    wide = decoded.filter(~F.col("op").isin("BEGIN", "COMMIT"))
    return wide.join(
        data_meta,
        (wide["frame_idx"] == data_meta["m_frame_idx"])
        & (wide["sub_idx"] == data_meta["m_sub_idx"]),
    ).select(
        "op",
        "schema",
        "table",
        "columns",
        "record",
        "old_record",
        "key_record",
        F.col("m_commit_ts").alias("commit_ts"),
        F.col("m_lsn_hi").alias("lsn_hi"),
        F.col("m_lsn_lo").alias("lsn_lo"),
        F.col("m_xid").alias("xid"),
        F.col("m_change_idx").alias("change_idx"),
    )


def decode_envelope(
    frames: DataFrame,
    payload_col: str = "payload",
    cache_decoded: bool = True,
    registry: dict[int, dict] | None = None,
) -> DataFrame:
    """frames(frame_idx, payload) → canonical change envelope: the full
    two-pass pipeline (registry collect → parallel decode → txn stamp).

    ``cache_decoded`` materializes the decoded rows once via a lazy
    ``localCheckpoint``: the stamping stage reads them twice (narrow
    metadata pass + wide rejoin), and without it each read would re-run
    the Python decode. localCheckpoint rather than ``cache()``,
    deliberately, on both grounds the drift monitors documented:
    (1) the downstream physical plan scans a pinned RDD instead of
    printing the full decode subtree once per cache reference, so the
    plan — and the pinned exchange budget — is independent of cache
    manager state; (2) measured at sf0.1 the cache path cost ~1 s more
    per run (InMemoryRelation columnar encode of the binary payload
    rows vs plain RDD block storage). The tradeoff is honest: lineage
    is truncated, so losing a checkpoint block means re-running the
    query, not recomputing a partition — acceptable for a bounded
    microbatch frame. Size is bounded by the microbatch, evicted LRU.

    ``registry``: pass a pre-collected relation registry (e.g. from
    ``collect_registry`` over just the Relation/Type frames, or a
    schema known out-of-band) to skip the pass-1 scan of the full
    frame stream — on storage that's a pruned re-scan, but on a
    synthesized/streamed source it's a whole extra materialization."""
    if registry is None:
        registry = collect_registry(frames, payload_col)
    decoded = decode_frames(frames, registry, payload_col)
    if cache_decoded:
        decoded = decoded.localCheckpoint(eager=False)
    return stamp_transactions(decoded)
