"""slot_sql statement parity (query_builder.ex:1-21)."""

import pytest

from walex_spark.sources import slot_sql as S


def test_statements_match_reference_shapes():
    assert S.publication_exists("events") == (
        "SELECT 1 FROM pg_publication WHERE pubname = 'events' LIMIT 1;"
    )
    assert S.slot_exists("walex_slot") == (
        "SELECT active FROM pg_replication_slots WHERE slot_name = 'walex_slot' LIMIT 1;"
    )
    assert S.create_temporary_slot("s1") == (
        "CREATE_REPLICATION_SLOT s1 TEMPORARY LOGICAL pgoutput NOEXPORT_SNAPSHOT;"
    )
    assert S.create_durable_slot("s1") == (
        "CREATE_REPLICATION_SLOT s1 LOGICAL pgoutput NOEXPORT_SNAPSHOT;"
    )
    assert S.start_replication_slot("s1", "events") == (
        "START_REPLICATION SLOT s1 LOGICAL 0/0 "
        "(proto_version '1', publication_names 'events')"
    )


@pytest.mark.parametrize(
    "bad", ["1slot", "s;DROP TABLE x", "S", "a-b", "", "s name"]
)
def test_rejects_invalid_identifiers(bad):
    with pytest.raises(ValueError):
        S.slot_exists(bad)
    with pytest.raises(ValueError):
        S.start_replication_slot("ok", bad)
