"""Byte-exact pgoutput capture of the reference's flagship scenario.

The reference's end-to-end test runs REAL logical replication against
the user/todo database (test/walex/event/event_test.exs:37-92, schema
from lib/mix/tasks/walex.setup.ex:99-133, the update from
test/support/test_helpers.ex:79-85) — no Postgres exists in this
container, so this module replays the SAME scenario from a
hand-assembled wire capture instead.

Crucially, the bytes here are built with ``struct.pack`` directly from
the published PostgreSQL logical-streaming-protocol layout — NOT with
walex_spark's own ``encode_*`` helpers — so a bug shared by our
encoder and decoder cannot cancel out the way it could in the existing
round-trip tests. Coverage: Type (custom citext OID), Relation
(REPLICA IDENTITY FULL), Begin, Insert, Update (old+new full rows, the
FULL-identity form PG emits for the reference's tables), unchanged
TOAST, Delete (old form), Truncate (2 relations), Commit, and PG text
encodings (quoted array literals, nested jsonb, timestamptz).
"""

import datetime as dt
import json
import struct

import pytest
from pyspark.sql import functions as F

from walex_spark.functions import pg_cast
from walex_spark.model import UNCHANGED_TOAST
from walex_spark.operators import transforms as X
from walex_spark.sources.pgoutput import decode_envelope

# -- raw wire assembly (protocol doc: protocol-logicalrep-message-formats) --

TOAST = object()  # sentinel: emit the 'u' (unchanged-TOAST) cell kind

PG_EPOCH = dt.datetime(2000, 1, 1)


def _us(d: dt.datetime) -> int:
    """Microseconds since the PG epoch (2000-01-01) — Begin/Commit ts."""
    return int((d - PG_EPOCH).total_seconds() * 1_000_000)


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _tuple(cells) -> bytes:
    out = struct.pack(">H", len(cells))
    for c in cells:
        if c is None:
            out += b"n"
        elif c is TOAST:
            out += b"u"
        else:
            b = c.encode()
            out += b"t" + struct.pack(">I", len(b)) + b
    return out


def w_type(oid: int, ns: str, name: str) -> bytes:
    return b"Y" + struct.pack(">I", oid) + _cstr(ns) + _cstr(name)


def w_relation(rel_id: int, ns: str, name: str, identity: bytes, cols) -> bytes:
    out = b"R" + struct.pack(">I", rel_id) + _cstr(ns) + _cstr(name)
    out += identity + struct.pack(">H", len(cols))
    for cname, oid, flags in cols:
        out += struct.pack("B", flags) + _cstr(cname) + struct.pack(">Ii", oid, -1)
    return out


def w_begin(lsn: int, ts: dt.datetime, xid: int) -> bytes:
    return b"B" + struct.pack(">QQI", lsn, _us(ts), xid)


def w_commit(lsn: int, ts: dt.datetime) -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, lsn, lsn + 8, _us(ts))


def w_insert(rel_id: int, cells) -> bytes:
    return b"I" + struct.pack(">I", rel_id) + b"N" + _tuple(cells)


def w_update_full(rel_id: int, old, new) -> bytes:
    """The REPLICA IDENTITY FULL update form: 'O' old row + 'N' new."""
    return (
        b"U" + struct.pack(">I", rel_id) + b"O" + _tuple(old) + b"N" + _tuple(new)
    )


def w_delete_full(rel_id: int, old) -> bytes:
    return b"D" + struct.pack(">I", rel_id) + b"O" + _tuple(old)


def w_truncate(rel_ids, options: int = 0) -> bytes:
    return (
        b"T"
        + struct.pack(">IB", len(rel_ids), options)
        + struct.pack(f">{len(rel_ids)}I", *rel_ids)
    )


# -- the reference scenario ------------------------------------------------

CITEXT_OID = 16391  # server-assigned custom-type OID -> announced via 'Y'
USER_REL, TODO_REL = 16389, 16390

# walex.setup.ex:99-115 — CREATE TABLE "user"; REPLICA IDENTITY FULL
# means every column arrives flagged as key (flags=1) and updates carry
# the full old row.
USER_COLS = [
    ("id", 23, 1),                  # int4 (SERIAL)
    ("email", CITEXT_OID, 1),       # citext -> resolved via the Y frame
    ("name", 1043, 1),              # varchar
    ("age", 23, 1),                 # int4
    ("books", 1015, 1),             # _varchar
    ("favorite_numbers", 1007, 1),  # _int4
    ("meta", 3802, 1),              # jsonb
    ("created_at", 1184, 1),        # timestamptz
    ("updated_at", 1184, 1),
]
TODO_COLS = [
    ("id", 2950, 1),                # uuid
    ("user_id", 23, 1),
    ("description", 25, 1),         # text (TOASTable)
    ("due_date", 1082, 1),          # date
    ("is_completed", 16, 1),        # bool
    ("priority", 23, 1),
    ("tags", 1015, 1),
    ("rules", 3802, 1),
    ("created_at", 1184, 1),
    ("updated_at", 1184, 1),
]

CREATED = "2023-01-01 08:00:00+00"
T_UPDATE = dt.datetime(2024, 1, 1, 12, 0, 0)
T_TODO = dt.datetime(2024, 1, 1, 12, 5, 0)

# seed row 1 of "user" (walex.setup.ex:141-147) before/after the
# test_helpers.ex:79-85 UPDATE (age 30, books, favorite_numbers, meta;
# updated_at bumped by the set_current_timestamp trigger)
USER_OLD = [
    "1", "john.doe@example.com", "John Doe", "28", "{}", "{}", "{}",
    CREATED, CREATED,
]
USER_NEW = [
    "1", "john.doe@example.com", "John Doe", "30",
    '{"book1, 2 and 3",book4}',       # quoted element: comma inside
    "{1,2,3}",
    '{"key": {"foo": "bar"}, "list": [1, 2, 3]}',
    CREATED, "2024-01-01 12:00:00+00",
]

TODO_ID = "0b9fa0b5-5b36-4a7a-8f7a-9d7e6f3b2c1d"
TODO_ROW = [
    TODO_ID, "1", "Buy groceries", "2023-01-10", "f", "2",
    "{groceries,shopping}", '{"reminder": true, "repeat": "weekly"}',
    CREATED, CREATED,
]
# UPDATE todo SET is_completed = true: description untouched and
# TOASTed -> PG ships the 'u' marker in the new row
TODO_DONE = [
    TODO_ID, "1", TOAST, "2023-01-10", "t", "2",
    "{groceries,shopping}", '{"reminder": true, "repeat": "weekly"}',
    CREATED, "2024-01-01 12:05:00+00",
]

CAPTURE = [
    # PG announces a custom type BEFORE the first Relation that uses it
    w_type(CITEXT_OID, "public", "citext"),
    w_relation(USER_REL, "public", "user", b"f", USER_COLS),
    w_relation(TODO_REL, "public", "todo", b"f", TODO_COLS),
    # txn 800: the event_test.exs update_user
    w_begin(0x16B3CD0, T_UPDATE, 800),
    w_update_full(USER_REL, USER_OLD, USER_NEW),
    w_commit(0x16B3CD0, T_UPDATE),
    # txn 801: todo lifecycle — insert, TOAST-carrying update,
    # delete (FULL old form), truncate of both tables
    w_begin(0x16B4000, T_TODO, 801),
    w_insert(TODO_REL, TODO_ROW),
    w_update_full(TODO_REL, TODO_ROW, TODO_DONE),
    w_delete_full(TODO_REL, TODO_DONE),
    w_truncate([USER_REL, TODO_REL]),
    w_commit(0x16B4000, T_TODO),
]


@pytest.fixture(scope="module")
def capture_env(spark):
    frames = spark.createDataFrame(
        [(i, p) for i, p in enumerate(CAPTURE)],
        "frame_idx long, payload binary",
    )
    return decode_envelope(frames).cache()


def test_citext_resolves_through_type_frame(capture_env):
    """The Y frame precedes the user Relation (as PG emits for a
    session-known custom type), so the email column's raw OID resolves
    to the registered name — decoder.ex TYPE handling parity."""
    row = capture_env.filter(F.col("op") == "UPDATE").filter(F.col("table") == "user").collect()[0]
    types = {c.name: c.type for c in row.columns}
    assert types["email"] == "citext"
    assert types["meta"] == "jsonb" and types["books"] == "_varchar"
    # REPLICA IDENTITY FULL: every column flagged as key
    assert all(c.is_key for c in row.columns)


def test_update_event_matches_reference_transaction(capture_env):
    """event_test.exs:55-92 — the UpdatedRecord the reference asserts,
    reproduced field-for-field from the wire bytes."""
    ev = X.filter_and_cast(capture_env, table="user", record_types=["update"])
    rows = ev.collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.name == "user" and row.type == "update"
    assert row.source.schema == "public" and row.source.table == "user"

    rec = row.new_record
    # typed parity with the reference's asserted record map
    assert pg_cast_py(rec["id"], "int4") == 1
    assert rec["name"] == "John Doe"
    assert pg_cast_py(rec["age"], "int4") == 30
    assert rec["email"] == "john.doe@example.com"
    assert pg_cast_py(rec["books"], "_varchar") == ["book1, 2 and 3", "book4"]
    assert pg_cast_py(rec["favorite_numbers"], "_int4") == [1, 2, 3]
    assert json.loads(rec["meta"]) == {"key": {"foo": "bar"}, "list": [1, 2, 3]}

    # changes diff: exactly the columns update_user touched (+ trigger)
    changes = {k: (v.old_value, v.new_value) for k, v in row.changes.items()}
    assert set(changes) == {"age", "books", "favorite_numbers", "meta", "updated_at"}
    assert changes["age"] == ("28", "30")

    assert row.timestamp == T_UPDATE
    assert row.lsn == "0/16B3CD0"


def test_todo_lifecycle_ops_in_wal_order(capture_env):
    rows = (
        capture_env.filter(F.col("xid") == 801).orderBy("change_idx").collect()
    )
    assert [(r.op, r.table) for r in rows] == [
        ("INSERT", "todo"),
        ("UPDATE", "todo"),
        ("DELETE", "todo"),
        ("TRUNCATE", "user"),
        ("TRUNCATE", "todo"),
    ]
    # WAL order is total and strictly increasing within the txn
    assert [r.change_idx for r in rows] == sorted({r.change_idx for r in rows})


def test_toast_marker_survives_decode_and_resolves(capture_env, spark):
    upd = (
        capture_env.filter((F.col("xid") == 801) & (F.col("op") == "UPDATE"))
        .collect()[0]
    )
    assert upd.record["description"] == UNCHANGED_TOAST
    # carry-forward resolution (decoder.ex:226-227 analog) restores the
    # inserted value from the prior change of the same row
    resolved = X.resolve_unchanged_toast(
        capture_env.filter(F.col("table") == "todo"),
        key_cols=["id"],
        columns=["description"],
    )
    vals = {
        r.change_idx: r.record["description"]
        for r in resolved.filter(F.col("op").isin(["INSERT", "UPDATE"])).collect()
    }
    assert vals[0] == "Buy groceries"
    assert vals[1] == "Buy groceries"  # TOAST sentinel replaced


def test_typed_casts_match_reference_values(capture_env, spark):
    """Spark-side pg_cast over the decoded text cells — uuid/date/bool/
    arrays/jsonb all materialize as the values the reference's typed
    Event would carry."""
    ins = (
        capture_env.filter((F.col("op") == "INSERT") & (F.col("table") == "todo"))
        .select(
            pg_cast(F.col("record")["user_id"], "int4").alias("user_id"),
            pg_cast(F.col("record")["due_date"], "date").alias("due_date"),
            pg_cast(F.col("record")["is_completed"], "bool").alias("done"),
            pg_cast(F.col("record")["tags"], "_varchar").alias("tags"),
            F.col("record")["id"].alias("id"),
        )
        .collect()[0]
    )
    assert ins.user_id == 1
    assert ins.due_date == dt.date(2023, 1, 10)
    assert ins.done is False
    assert ins.tags == ["groceries", "shopping"]
    assert ins.id == TODO_ID


# -- helper: evaluate pg_cast on one python value via a 1-row frame --------

_cast_cache: dict[tuple[str, str], object] = {}


def pg_cast_py(value: str, pg_type: str):
    spark = _SPARK[0]
    key = (value, pg_type)
    if key not in _cast_cache:
        df = spark.createDataFrame([(value,)], "v string")
        _cast_cache[key] = df.select(pg_cast(F.col("v"), pg_type).alias("o")).collect()[0].o
    return _cast_cache[key]


_SPARK = []


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    if not _SPARK:
        _SPARK.append(spark)
    yield
