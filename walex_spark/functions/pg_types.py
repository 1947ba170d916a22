"""PG wire-type → Spark cast expression library.

Behavioral parity with the reference's cast layer:
  - OID → type-name registry <- lib/walex/decoder/oid_database.ex:22-164
    (OIDs themselves are public Postgres catalog constants)
  - per-type text casts      <- lib/walex/casting/types.ex

Design (SURVEY.md §1.2, §7.3/§7.4): every cast is a pure
``Column``-expression builder, so the whole cast layer stays inside
Catalyst/whole-stage-codegen — there is no per-row Python in the hot
path. The only Python is the PG array-literal parser, used solely on
text-envelope arrays, and it runs as an Arrow-batched pandas UDF.

Semantics deviations from the reference (documented per §7.4):
  - The reference falls back to the raw string when a cast fails
    (types.ex:429-431 and per-cast rescues). A typed Spark column
    cannot be "long or string", so `pg_cast` uses try_cast semantics
    (NULL on failure); `pg_cast_lenient` returns a
    struct(value, raw, ok) when fidelity matters.
  - numeric is DecimalType(38,18) (PG numeric is unbounded);
    NaN/±Infinity for numeric become NULL with `pg_numeric_special`
    available as a companion flag expression. float4/8 keep native
    NaN/±Inf (Spark doubles support them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from walex_spark.functions.array_parser import PgArrayParseError, parse_pg_array

# ---------------------------------------------------------------------------
# OID registry (public Postgres catalog numbers; same surface as
# oid_database.ex:22-164)
# ---------------------------------------------------------------------------

OID_TO_NAME: dict[int, str] = {
    16: "bool", 17: "bytea", 18: "char", 19: "name", 20: "int8",
    21: "int2", 23: "int4", 24: "regproc", 25: "text", 26: "oid",
    27: "tid", 28: "xid", 29: "cid", 114: "json", 142: "xml",
    194: "pg_node_tree", 600: "point", 601: "lseg", 602: "path",
    603: "box", 604: "polygon", 628: "line", 650: "cidr",
    700: "float4", 701: "float8", 705: "unknown", 718: "circle",
    774: "macaddr8", 790: "money", 829: "macaddr", 869: "inet",
    1033: "aclitem", 1042: "bpchar", 1043: "varchar", 1082: "date",
    1083: "time", 1114: "timestamp", 1184: "timestamptz",
    1186: "interval", 1266: "timetz", 1560: "bit", 1562: "varbit",
    1700: "numeric", 1790: "refcursor", 2202: "regprocedure",
    2203: "regoper", 2204: "regoperator", 2205: "regclass",
    2206: "regtype", 2950: "uuid", 2970: "txid_snapshot",
    3220: "pg_lsn", 3361: "pg_ndistinct", 3402: "pg_dependencies",
    3614: "tsvector", 3615: "tsquery", 3642: "gtsvector",
    3734: "regconfig", 3769: "regdictionary", 3802: "jsonb",
    4089: "regnamespace", 4096: "regrole", 5017: "pg_mcv_list",
    3904: "int4range", 3906: "numrange", 3908: "tsrange",
    3910: "tstzrange", 3912: "daterange", 3926: "int8range",
    # array types (leading underscore convention, as in the reference)
    1000: "_bool", 1001: "_bytea", 1002: "_char", 1003: "_name",
    1005: "_int2", 1007: "_int4", 1016: "_int8", 1009: "_text",
    1014: "_bpchar", 1015: "_varchar", 1021: "_float4",
    1022: "_float8", 1028: "_oid", 1040: "_macaddr", 1041: "_inet",
    651: "_cidr", 1115: "_timestamp", 1182: "_date", 1183: "_time",
    1185: "_timestamptz", 1187: "_interval", 1231: "_numeric",
    1270: "_timetz", 1561: "_bit", 1563: "_varbit", 199: "_json",
    3807: "_jsonb", 2951: "_uuid", 791: "_money", 143: "_xml",
    22: "int2vector", 30: "oidvector", 4072: "jsonpath",
    1010: "_tid", 1011: "_xid", 1012: "_cid", 1013: "_oidvector",
    1017: "_point", 1018: "_lseg", 1019: "_path", 1020: "_box",
    1027: "_polygon", 719: "_circle", 629: "_line",
    775: "_macaddr8", 1034: "_aclitem", 2201: "_refcursor",
    3221: "_pg_lsn", 3643: "_tsvector", 3645: "_tsquery",
    3905: "_int4range", 3907: "_numrange", 3909: "_tsrange",
    3911: "_tstzrange", 3913: "_daterange", 3927: "_int8range",
    4073: "_jsonpath", 2287: "_record", 2249: "record",
    # obsolete / internal PG types, carried solely for byte-exact
    # name_for_type_id parity with oid_database.ex:22-164 — all decode
    # through the lenient string passthrough (no typed cast exists for
    # them in any engine)
    210: "smgr", 702: "abstime", 703: "reltime", 704: "tinterval",
    1006: "_int2vector", 1008: "_regproc", 1023: "_abstime",
    1024: "_reltime", 1025: "_tinterval", 1263: "_cstring",
    2207: "_regprocedure", 2208: "_regoper", 2209: "_regoperator",
    2210: "_regclass", 2211: "_regtype", 2949: "_txid_snapshot",
    3644: "_gtsvector", 3735: "_regconfig", 3770: "_regdictionary",
    4090: "_regnamespace", 4097: "_regrole",
}
NAME_TO_OID = {v: k for k, v in OID_TO_NAME.items()}

DECIMAL_PRECISION, DECIMAL_SCALE = 38, 18
_DECIMAL = T.DecimalType(DECIMAL_PRECISION, DECIMAL_SCALE)
_MONEY = T.DecimalType(19, 2)

_PASSTHROUGH = {
    "text", "varchar", "bpchar", "char", "name", "uuid", "xml",
    "interval", "inet", "cidr", "macaddr", "macaddr8", "tsvector",
    "tsquery", "bit", "varbit", "oid", "regproc", "regprocedure",
    "regoper", "regoperator", "regclass", "regtype", "regconfig",
    "regdictionary", "regnamespace", "regrole", "pg_lsn",
    "pg_snapshot", "txid_snapshot", "point", "line", "lseg", "box",
    "path", "polygon", "circle", "int4range", "int8range", "numrange",
    "tsrange", "tstzrange", "daterange", "citext", "json", "jsonb",
    "unknown", "tid", "xid", "cid", "refcursor", "aclitem",
}


def spark_type_for(pg_type: str) -> T.DataType:
    """Target Spark type for a PG wire type (SURVEY.md §1.2 table)."""
    t = pg_type.lower()
    if t.startswith("_"):
        return T.ArrayType(spark_type_for(t[1:]))
    if t == "bool":
        return T.BooleanType()
    if t == "int2":
        return T.ShortType()
    if t == "int4":
        return T.IntegerType()
    if t in ("int8", "serial8", "bigserial"):
        return T.LongType()
    if t == "float4":
        return T.FloatType()
    if t == "float8":
        return T.DoubleType()
    if t in ("numeric", "decimal"):
        return _DECIMAL
    if t == "money":
        return _MONEY
    if t == "timestamp":
        return T.TimestampNTZType()
    if t == "timestamptz":
        return T.TimestampType()
    if t == "date":
        return T.DateType()
    if t == "bytea":
        return T.BinaryType()
    return T.StringType()  # time/timetz + all passthrough types


def _cast_scalar(col: Column, t: str) -> Column:
    if t == "bool":
        # reference: "t"→true, "f"→false (types.ex:35-36); lenient else NULL
        return (
            F.when(col == "t", F.lit(True))
            .when(col == "f", F.lit(False))
            .otherwise(col.try_cast(T.BooleanType()))
        )
    if t == "int2":
        return col.try_cast(T.ShortType())
    if t == "int4":
        return col.try_cast(T.IntegerType())
    if t == "int8":
        return col.try_cast(T.LongType())
    if t == "float4":
        return col.try_cast(T.FloatType())  # handles NaN/±Infinity natively
    if t == "float8":
        return col.try_cast(T.DoubleType())
    if t in ("numeric", "decimal"):
        # NaN/±Inf → NULL (Spark decimal has no specials — §7.4);
        # pg_numeric_special() carries the flag.
        return col.try_cast(_DECIMAL)
    if t == "money":
        # strip currency symbols/commas, keep digits . - (types.ex:127-132)
        return F.regexp_replace(col, r"[^0-9.\-]", "").try_cast(_MONEY)
    if t == "timestamp":
        return col.try_cast(T.TimestampNTZType())
    if t == "timestamptz":
        return col.try_cast(T.TimestampType())
    if t == "date":
        return col.try_cast(T.DateType())
    if t == "time":
        return col  # Spark has no TimeType; keep ISO string (§1.2)
    if t == "timetz":
        # reference truncates the offset: String.slice(record, 0..7)
        # (types.ex:117-125)
        return F.substring(col, 1, 8)
    if t == "bytea":
        # \x-prefixed hex → binary (types.ex:134-143)
        return F.when(
            col.startswith("\\x"), F.unhex(col.substr(F.lit(3), F.length(col)))
        ).otherwise(col.cast(T.BinaryType()))
    if t in _PASSTHROUGH:
        return col
    return col  # unknown type: passthrough, never fail (types.ex:429-431)


def pg_cast(col: Column | str, pg_type: str) -> Column:
    """Typed cast of a text-encoded PG value (types.ex dispatch table).

    Array types (`_`-prefixed) parse the PG literal with the pandas-UDF
    parser, then apply the element cast JVM-side via ``F.transform``.
    """
    if isinstance(col, str):
        col = F.col(col)
    t = pg_type.lower()
    if t.startswith("_"):
        elem = t[1:]
        return F.transform(pg_array_strings(col), lambda x: _cast_scalar(x, elem))
    return _cast_scalar(col, t)


def pg_numeric_special(col: Column | str) -> Column:
    """Companion flag for numeric columns: 'nan' | 'infinity' |
    '-infinity' | NULL (reference keeps atoms — types.ex:42-46)."""
    if isinstance(col, str):
        col = F.col(col)
    low = F.lower(col)
    return (
        F.when(low == "nan", F.lit("nan"))
        .when(low == "infinity", F.lit("infinity"))
        .when(low == "-infinity", F.lit("-infinity"))
        .otherwise(F.lit(None).cast(T.StringType()))
    )


def pg_cast_lenient(col: Column | str, pg_type: str) -> Column:
    """struct(value, raw, ok) — reference-faithful lenient cast: the raw
    string survives when the typed cast failed (types.ex fallback)."""
    if isinstance(col, str):
        col = F.col(col)
    value = pg_cast(col, pg_type)
    ok = value.isNotNull() | col.isNull()
    return F.struct(value.alias("value"), col.alias("raw"), ok.alias("ok"))


# ---------------------------------------------------------------------------
# Array-literal parsing (text envelope only — SURVEY.md §7.3)
# ---------------------------------------------------------------------------

def _parse_array_batch(series):
    import pandas as pd

    def one(v):
        if v is None:
            return None
        try:
            parsed = parse_pg_array(v)
        except PgArrayParseError:
            return None
        # flatten-preserving: only 1-D arrays keep elements; nested
        # sub-arrays are re-serialized (Spark column must be 1-typed).
        out = []
        for item in parsed:
            if isinstance(item, list):
                out.append(_reserialize(item))
            else:
                out.append(item)
        return out

    return series.map(one, na_action="ignore") if hasattr(series, "map") else pd.Series(
        [one(v) for v in series]
    )


def _reserialize(lst) -> str:
    parts = []
    for item in lst:
        if item is None:
            parts.append("NULL")
        elif isinstance(item, list):
            parts.append(_reserialize(item))
        else:
            esc = str(item).replace("\\", "\\\\").replace('"', '\\"')
            parts.append(f'"{esc}"')
    return "{" + ",".join(parts) + "}"


_pg_array_udf = None


def pg_array_strings(col: Column | str) -> Column:
    """Parse a PG array literal column → array<string> (NULL cells kept;
    nested sub-arrays re-serialized as literals for a second parse pass).

    Arrow-batched pandas UDF — the slow path, used only for text
    envelopes (JDBC ingest yields ArrayType natively).
    """
    global _pg_array_udf
    if _pg_array_udf is None:
        import pandas as pd  # noqa: F401

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _udf(s):
            return _parse_array_batch(s)

        _pg_array_udf = _udf
    if isinstance(col, str):
        col = F.col(col)
    return _pg_array_udf(col)


def pg_record_struct(
    record_col: Column | str, columns: list[tuple[str, str]]
) -> Column:
    """Typed struct from a text-encoded record map given wire columns.

    Mirrors data_tuple_to_map + cast_record (publisher.ex:247-279): the
    positional zip+cast becomes a single select list — one expression
    per column, built once per table schema, not per row.

    ``columns``: list of (column_name, pg_type_name).
    """
    if isinstance(record_col, str):
        record_col = F.col(record_col)
    fields = [
        pg_cast(record_col.getItem(name), pg_type).alias(name)
        for name, pg_type in columns
    ]
    return F.struct(*fields)
