"""Postgres array-literal parser.

Behavioral parity with the reference's recursive-descent parser
(lib/walex/casting/array_parser.ex:43-165): handles ``{}`` nesting,
``NULL`` cells, double-quoted strings with ``\\"`` and ``\\\\`` escapes,
commas inside quotes, and arbitrarily nested sub-arrays. Returns
nested Python lists of strings (or None for NULL); the caller applies
element casts.

This is pure Python on purpose: it is only needed on the *text
envelope* ingest path (JDBC ingestion yields real java.sql.Array →
ArrayType for free — SURVEY.md §7.3). On the envelope path it runs as
an Arrow-batched pandas UDF (functions/pg_types.py), never per-row
through a Python UDF.
"""

from __future__ import annotations


class PgArrayParseError(ValueError):
    pass


def parse_pg_array(literal: str | None):
    """Parse a PG array literal like '{1,NULL,"a,b",{2,3}}'.

    Returns a (possibly nested) list of ``str | None | list``.
    Raises PgArrayParseError on malformed input (reference returns
    error tuples for these: array_parser.ex:47-58).
    """
    if literal is None:
        return None
    s = literal.strip()
    if not s.startswith("{"):
        raise PgArrayParseError(f"not an array literal: {literal!r}")
    value, pos = _parse_array(s, 0)
    if s[pos:].strip():
        raise PgArrayParseError(f"trailing content after array: {literal!r}")
    return value


def _parse_array(s: str, i: int):
    assert s[i] == "{"
    i += 1
    out: list = []
    n = len(s)
    expect_value = True
    while i < n:
        c = s[i]
        if c == "}":
            return out, i + 1
        if c == ",":
            if expect_value:
                raise PgArrayParseError(f"empty cell at {i} in {s!r}")
            i += 1
            expect_value = True
            continue
        if c.isspace():
            i += 1
            continue
        if not expect_value:
            raise PgArrayParseError(f"missing comma at {i} in {s!r}")
        if c == "{":
            sub, i = _parse_array(s, i)
            out.append(sub)
        elif c == '"':
            val, i = _parse_quoted(s, i)
            out.append(val)
        else:
            val, i = _parse_bare(s, i)
            out.append(None if val.upper() == "NULL" else val)
        expect_value = False
    raise PgArrayParseError(f"unterminated array: {s!r}")


def _parse_quoted(s: str, i: int):
    assert s[i] == '"'
    i += 1
    buf: list[str] = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            if i + 1 >= n:
                raise PgArrayParseError(f"dangling escape in {s!r}")
            buf.append(s[i + 1])
            i += 2
        elif c == '"':
            return "".join(buf), i + 1
        else:
            buf.append(c)
            i += 1
    raise PgArrayParseError(f"unterminated quote in {s!r}")


def _parse_bare(s: str, i: int):
    buf: list[str] = []
    n = len(s)
    while i < n and s[i] not in ",}":
        buf.append(s[i])
        i += 1
    return "".join(buf).strip(), i
