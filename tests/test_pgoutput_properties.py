"""Property-based round-trip tests for the pgoutput binary codec
(sources/pgoutput.py): for ARBITRARY cell values, column names, and
ids, encode → decode_message must return exactly what went in. The
golden tests in test_pgoutput.py pin known frames; these sweep the
input space (unicode, NULs are excluded only where the wire format
itself cannot carry them — column names are C strings).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from walex_spark.sources.pgoutput import (
    UNCHANGED_TOAST,
    decode_message,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_truncate,
    encode_update,
)

# any unicode text cell, NULL, or the unchanged-TOAST sentinel
cells = st.lists(
    st.one_of(
        st.none(),
        st.just(UNCHANGED_TOAST),
        # cell text is UTF-8 on the wire: exclude lone surrogates (Cs)
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=200,
        ),
    ),
    min_size=1,
    max_size=8,
)
# column names travel as NUL-terminated C strings: any UTF-8-encodable
# text without NUL (PG identifiers are valid UTF-8 — lone surrogates
# cannot occur on the wire and cannot be .encode()d)
colnames = st.text(
    alphabet=st.characters(
        blacklist_characters="\x00", blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=30,
)
lsns = st.integers(min_value=0, max_value=(1 << 64) - 1)
oids = st.integers(min_value=0, max_value=(1 << 32) - 1)


@settings(max_examples=200, deadline=None)
@given(cells=cells, rel_id=oids)
def test_insert_round_trip(cells, rel_id):
    m = decode_message(encode_insert(rel_id, cells))
    assert m["op"] == "INSERT"
    assert m["relation_id"] == rel_id
    assert m["new"] == list(cells)


@settings(max_examples=200, deadline=None)
@given(new=cells, old=st.one_of(st.none(), cells), key=st.one_of(st.none(), cells))
def test_update_three_forms_round_trip(new, old, key):
    if old is not None and key is not None:
        key = None  # the wire format carries at most one of O/K
    m = decode_message(encode_update(7, new, old=old, key=key))
    assert m["op"] == "UPDATE"
    assert m["new"] == list(new)
    assert m["old"] == (list(old) if old is not None else None)
    assert m["key"] == (list(key) if key is not None else None)


@settings(max_examples=200, deadline=None)
@given(old=st.one_of(st.none(), cells), key=cells)
def test_delete_round_trip(old, key):
    if old is not None:
        m = decode_message(encode_delete(3, old=old))
        assert m["old"] == list(old) and m["key"] is None
    else:
        m = decode_message(encode_delete(3, key=key))
        assert m["key"] == list(key) and m["old"] is None
    assert m["op"] == "DELETE"


@settings(max_examples=100, deadline=None)
@given(
    rel_id=oids,
    name=colnames,
    cols=st.lists(
        st.tuples(colnames, oids, st.booleans()), min_size=1, max_size=6
    ),
)
def test_relation_round_trip(rel_id, name, cols):
    m = decode_message(encode_relation(rel_id, name, cols))
    assert m["op"] == "RELATION" and m["relation_id"] == rel_id
    assert m["name"] == name
    assert [c["name"] for c in m["columns"]] == [c[0] for c in cols]
    assert [c["is_key"] for c in m["columns"]] == [c[2] for c in cols]


@settings(max_examples=100, deadline=None)
@given(lsn=lsns, xid=oids)
def test_begin_commit_round_trip(lsn, xid):
    b = decode_message(encode_begin(lsn, 0, xid))
    assert b["op"] == "BEGIN" and b["final_lsn"] == lsn and b["xid"] == xid
    c = decode_message(encode_commit(lsn, 0))
    assert c["op"] == "COMMIT" and c["commit_lsn"] == lsn


@settings(max_examples=100, deadline=None)
@given(rel_ids=st.lists(oids, min_size=1, max_size=10), options=st.integers(0, 3))
def test_truncate_round_trip(rel_ids, options):
    m = decode_message(encode_truncate(rel_ids, options))
    assert m["op"] == "TRUNCATE"
    assert m["relation_ids"] == list(rel_ids) and m["options"] == options
