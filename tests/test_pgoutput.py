"""pgoutput binary decoder golden tests (tier-1 analog of
test/walex/decoder/decoder_test.exs:22-226: hand-built frames → exact
expected structures, covering NULL cells, unchanged-TOAST cells and
every replica-identity variant), plus the two-pass Spark pipeline
end-to-end."""

import struct

import pytest

from walex_spark.model import UNCHANGED_TOAST
from walex_spark.sources.pgoutput import (
    decode_envelope,
    decode_message,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_truncate,
    encode_update,
)

PG_EPOCH_US_2024 = 757382400000000  # 2024-01-01 00:00:00 UTC in µs since 2000-01-01


def frame_begin(lsn=100, ts=PG_EPOCH_US_2024, xid=700) -> bytes:
    return encode_begin(lsn, ts, xid)


def frame_commit(lsn=100, ts=PG_EPOCH_US_2024) -> bytes:
    return encode_commit(lsn, ts)


def frame_relation(rel_id=1, name="user", cols=(("id", 23, True), ("name", 25, False))) -> bytes:
    return encode_relation(rel_id, name, list(cols))


def frame_insert(rel_id=1, cells=("1", "alice")) -> bytes:
    return encode_insert(rel_id, cells)


def frame_update(rel_id=1, new=("1", "bob"), old=None, key=None) -> bytes:
    return encode_update(rel_id, new, old, key)


def frame_delete(rel_id=1, old=None, key=None) -> bytes:
    return encode_delete(rel_id, old, key)


def frame_truncate(rel_ids=(1,), options=0) -> bytes:
    return encode_truncate(rel_ids, options)


# -- pure decode golden values -------------------------------------------


def test_decode_begin():
    m = decode_message(frame_begin(lsn=(2 << 32) | 123, xid=999))
    assert m["op"] == "BEGIN" and m["xid"] == 999
    assert m["final_lsn"] == (2 << 32) | 123
    assert m["commit_ts"].year == 2024 and m["commit_ts"].month == 1


def test_decode_commit():
    m = decode_message(frame_commit(lsn=456))
    assert m["op"] == "COMMIT" and m["commit_lsn"] == 456 and m["end_lsn"] == 464


def test_decode_relation_oids_and_keys():
    m = decode_message(
        frame_relation(rel_id=7, cols=(("id", 23, True), ("tags", 1009, False)))
    )
    assert m["op"] == "RELATION" and m["relation_id"] == 7
    assert m["replica_identity"] == "default"
    assert m["columns"][0] == {
        "name": "id", "type": "int4", "is_key": True, "type_modifier": -1,
    }
    assert m["columns"][1]["type"] == "_text"


def test_decode_insert_with_null_and_toast():
    m = decode_message(frame_insert(cells=("1", None)))
    assert m["op"] == "INSERT" and m["new"] == ["1", None]
    m2 = decode_message(frame_insert(cells=("1", UNCHANGED_TOAST)))
    assert m2["new"] == ["1", UNCHANGED_TOAST]


def test_decode_update_three_forms():
    n = decode_message(frame_update(new=("1", "b")))
    assert (n["old"], n["key"]) == (None, None)
    o = decode_message(frame_update(new=("1", "b"), old=("1", "a")))
    assert o["old"] == ["1", "a"] and o["key"] is None
    k = decode_message(frame_update(new=("1", "b"), key=("1", None)))
    assert k["key"] == ["1", None] and k["old"] is None


def test_decode_delete_two_forms():
    k = decode_message(frame_delete(key=("5", None)))
    assert k["op"] == "DELETE" and k["key"] == ["5", None] and k["old"] is None
    o = decode_message(frame_delete(old=("5", "eve")))
    assert o["old"] == ["5", "eve"] and o["key"] is None


def test_decode_truncate_and_unsupported():
    t = decode_message(frame_truncate(rel_ids=(1, 2), options=1))
    assert t["op"] == "TRUNCATE" and t["relation_ids"] == [1, 2] and t["options"] == 1
    assert decode_message(b"Zxx")["op"] == "UNSUPPORTED"


def test_decode_utf8_and_quotes():
    m = decode_message(frame_insert(cells=('{"k": "véλ"}', "x,y\\z")))
    assert m["new"] == ['{"k": "véλ"}', "x,y\\z"]


# -- two-pass Spark pipeline ---------------------------------------------


@pytest.fixture()
def frames(spark):
    payloads = [
        frame_relation(rel_id=1, name="user"),
        frame_relation(rel_id=2, name="todo", cols=(("id", 23, True), ("done", 16, False))),
        # txn 700: insert + update(with old) + commit
        frame_begin(lsn=1000, xid=700),
        frame_insert(rel_id=1, cells=("1", "alice")),
        frame_update(rel_id=1, new=("1", "bob"), old=("1", "alice")),
        frame_commit(lsn=1000),
        # txn 701: delete by key + truncate of both tables + commit
        frame_begin(lsn=2000, xid=701),
        frame_delete(rel_id=2, key=("9", None)),
        frame_truncate(rel_ids=(1, 2)),
        frame_commit(lsn=2000),
        # txn 702: change for an UNKNOWN relation (dropped) then commit
        frame_begin(lsn=3000, xid=702),
        frame_insert(rel_id=99, cells=("x",)),
        frame_commit(lsn=3000),
        # txn 703: never commits → dropped entirely
        frame_begin(lsn=4000, xid=703),
        frame_insert(rel_id=1, cells=("2", "carol")),
    ]
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "frame_idx long, payload binary"
    )


def test_decode_envelope_end_to_end(spark, frames):
    env = decode_envelope(frames).orderBy("lsn_lo", "change_idx")
    rows = env.collect()
    by_xid = {}
    for r in rows:
        by_xid.setdefault(r.xid, []).append(r)
    # txn 700: two ordered changes, typed column metadata, record maps
    ops = [(r.op, r.change_idx) for r in by_xid[700]]
    assert ops == [("INSERT", 0), ("UPDATE", 1)]
    ins, upd = by_xid[700]
    assert ins.record == {"id": "1", "name": "alice"}
    assert upd.old_record == {"id": "1", "name": "alice"}
    assert upd.record == {"id": "1", "name": "bob"}
    assert ins.columns[0].type == "int4" and ins.columns[0].is_key
    assert ins.lsn_lo == 1000 and ins.commit_ts.year == 2024
    # txn 701: delete (key form) + one TRUNCATE row per relation
    assert [(r.op, r.table) for r in by_xid[701]] == [
        ("DELETE", "todo"), ("TRUNCATE", "user"), ("TRUNCATE", "todo"),
    ]
    assert by_xid[701][0].key_record == {"id": "9", "done": None}
    # txn 702's unknown-relation change dropped; 703 never committed
    assert 702 not in by_xid and 703 not in by_xid


def test_decode_envelope_feeds_transforms(spark, frames):
    from walex_spark.operators import transforms as X

    env = decode_envelope(frames)
    ev = X.filter_and_cast(env, table="user", record_types=["update"])
    row = ev.collect()[0]
    assert {k: v.asDict() for k, v in row.changes.items()} == {
        "name": {"old_value": "alice", "new_value": "bob"}
    }
    assert row.lsn == "0/3E8"


def test_stamp_transactions_block_parallel_equivalence(spark, frames):
    """The two-pass block prefix scan must stamp identically at any
    block size: block_size=2 forces BEGINs and their changes into
    different blocks (cross-block carry) and several empty-carry
    blocks; compare against the single-block degenerate case."""
    from walex_spark.sources.pgoutput import (
        collect_registry, decode_frames, stamp_transactions,
    )

    registry = collect_registry(frames)
    decoded = decode_frames(frames, registry).cache()
    key = ["op", "table", "xid", "lsn_lo", "change_idx"]
    single = sorted(
        (tuple(r[k] for k in key) for r in stamp_transactions(decoded, block_size=1 << 16).collect())
    )
    for bs in (1, 2, 3):
        multi = sorted(
            (tuple(r[k] for k in key) for r in stamp_transactions(decoded, block_size=bs).collect())
        )
        assert multi == single, f"block_size={bs} diverged"
    assert single  # non-vacuous


def test_arity_mismatch_fails_loud(spark):
    """A data tuple whose arity disagrees with the registry (mid-stream
    schema change) must fail the decode, not silently NULL the record."""
    from walex_spark.sources.pgoutput import decode_envelope

    payloads = [
        frame_relation(rel_id=1, name="user"),  # 2 columns
        frame_begin(lsn=1000, xid=700),
        frame_insert(rel_id=1, cells=("1", "alice", "extra")),  # 3 cells
        frame_commit(lsn=1000),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "frame_idx long, payload binary"
    )
    with pytest.raises(Exception, match="arity"):
        decode_envelope(df).collect()


def test_mid_stream_schema_change_versioned_registry(spark):
    """A Relation re-sent mid-stream applies only to LATER frames:
    earlier frames decode against the schema current at their position,
    and a data frame arriving before any Relation announcement is
    skipped (not decoded against a future schema)."""
    from walex_spark.sources.pgoutput import decode_envelope

    payloads = [
        # frame 0: insert BEFORE any Relation frame → must be skipped
        frame_begin(lsn=500, xid=699),
        frame_insert(rel_id=1, cells=("0", "zed")),
        frame_commit(lsn=500),
        frame_relation(rel_id=1, name="user",
                       cols=(("id", 23, True), ("name", 25, False))),
        frame_begin(lsn=1000, xid=700),
        frame_insert(rel_id=1, cells=("1", "alice")),
        frame_commit(lsn=1000),
        # schema change: second column renamed name → nickname
        frame_relation(rel_id=1, name="user",
                       cols=(("id", 23, True), ("nickname", 25, False))),
        frame_begin(lsn=2000, xid=701),
        frame_insert(rel_id=1, cells=("2", "bob")),
        frame_commit(lsn=2000),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "frame_idx long, payload binary"
    )
    rows = {r.xid: r for r in decode_envelope(df).collect()}
    assert 699 not in rows  # pre-announcement frame skipped
    assert rows[700].record == {"id": "1", "name": "alice"}
    assert rows[701].record == {"id": "2", "nickname": "bob"}
