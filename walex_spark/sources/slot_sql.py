"""Replication-slot / publication management SQL.

Parity with lib/walex/replication/query_builder.ex:1-21: the literal
statements a deployment runs against Postgres to check and create the
publication and replication slot the capture side depends on. The
Spark engine itself consumes already-captured envelopes (BASELINE.json
approach), so these are emitted for the operator's provisioning
connection (psql / JDBC statement), not executed by Spark — but they
are the same strings, so a walex user's runbook ports 1:1.

Identifiers are validated (not quoted) because replication commands
like CREATE_REPLICATION_SLOT don't accept quoted identifiers — same
constraint the reference inherits.
"""

from __future__ import annotations

import re

__all__ = [
    "publication_exists",
    "slot_exists",
    "create_temporary_slot",
    "create_durable_slot",
    "start_replication_slot",
]

_IDENT = re.compile(r"^[a-z_][a-z0-9_]*$")


def _check(name: str, what: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"{what} {name!r} is not a valid replication identifier")
    return name


def publication_exists(publication: str) -> str:
    """query_builder.ex:2-4."""
    p = _check(publication, "publication")
    return f"SELECT 1 FROM pg_publication WHERE pubname = '{p}' LIMIT 1;"


def slot_exists(slot_name: str) -> str:
    """query_builder.ex:6-8 — returns the slot's `active` flag, the
    signal behind SlotInUseError."""
    s = _check(slot_name, "slot")
    return f"SELECT active FROM pg_replication_slots WHERE slot_name = '{s}' LIMIT 1;"


def create_temporary_slot(slot_name: str) -> str:
    """query_builder.ex:10-12 — at-most-once across restarts (the
    in-memory-cursor analog, jdbc.py)."""
    s = _check(slot_name, "slot")
    return f"CREATE_REPLICATION_SLOT {s} TEMPORARY LOGICAL pgoutput NOEXPORT_SNAPSHOT;"


def create_durable_slot(slot_name: str) -> str:
    """query_builder.ex:14-16 — resume + replay (the checkpointed
    cursor analog)."""
    s = _check(slot_name, "slot")
    return f"CREATE_REPLICATION_SLOT {s} LOGICAL pgoutput NOEXPORT_SNAPSHOT;"


def start_replication_slot(slot_name: str, publication: str) -> str:
    """query_builder.ex:18-20 — protocol v1, the version
    sources/pgoutput.py decodes."""
    s = _check(slot_name, "slot")
    p = _check(publication, "publication")
    return (
        f"START_REPLICATION SLOT {s} LOGICAL 0/0 "
        f"(proto_version '1', publication_names '{p}')"
    )
