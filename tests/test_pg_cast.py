"""Golden tests for the pg_cast expression library — same golden values
as the reference's cast suite (test/walex/casting/types_test.exs; see
FIXTURES.md §4)."""

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from walex_spark.functions import pg_cast
from walex_spark.functions.pg_types import OID_TO_NAME, pg_numeric_special, spark_type_for


def _cast_one(spark, value, pg_type):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(pg_cast(F.col("v"), pg_type).alias("r")).collect()[0].r


def test_bool(spark):
    assert _cast_one(spark, "t", "bool") is True
    assert _cast_one(spark, "f", "bool") is False


def test_int8_max(spark):
    assert _cast_one(spark, "9223372036854775807", "int8") == 9223372036854775807


def test_int_failure_is_null(spark):
    # deviation from reference (string passthrough): typed column → NULL
    assert _cast_one(spark, "not_a_number", "int4") is None


def test_numeric_precision(spark):
    assert _cast_one(spark, "123.4567890123456789", "numeric") == Decimal(
        "123.456789012345678900"
    )


def test_float_specials(spark):
    import math

    assert math.isnan(_cast_one(spark, "NaN", "float8"))
    assert _cast_one(spark, "Infinity", "float8") == float("inf")
    assert _cast_one(spark, "-Infinity", "float8") == float("-inf")


def test_numeric_specials_flagged(spark):
    df = spark.createDataFrame([("NaN",), ("-Infinity",), ("1.5",)], "v string")
    rows = df.select(pg_numeric_special(F.col("v")).alias("s")).collect()
    assert [r.s for r in rows] == ["nan", "-infinity", None]


def test_timestamptz(spark):
    got = _cast_one(spark, "2024-01-15T10:30:00Z", "timestamptz")
    assert got == dt.datetime(2024, 1, 15, 10, 30)


def test_money(spark):
    assert _cast_one(spark, "$123.45", "money") == Decimal("123.45")
    assert _cast_one(spark, "-$67.89", "money") == Decimal("-67.89")


def test_bytea_hex(spark):
    assert bytes(_cast_one(spark, "\\x48656c6c6f", "bytea")) == b"Hello"


def test_int4_array_with_null(spark):
    assert _cast_one(spark, "{1,NULL,3}", "_int4") == [1, None, 3]


def test_varchar_array_quoted_comma(spark):
    assert _cast_one(spark, '{"book1, 2 and 3","book4"}', "_varchar") == [
        "book1, 2 and 3",
        "book4",
    ]


def test_bool_array(spark):
    assert _cast_one(spark, "{t,f,t}", "_bool") == [True, False, True]


def test_interval_passthrough(spark):
    assert _cast_one(spark, "1 year 2 months 3 days", "interval") == "1 year 2 months 3 days"


def test_range_passthrough(spark):
    assert _cast_one(spark, "[1,10)", "int4range") == "[1,10)"


def test_unknown_type_passthrough(spark):
    assert _cast_one(spark, "whatever", "some_custom_type") == "whatever"


def test_timetz_truncates_offset(spark):
    assert _cast_one(spark, "10:30:00+05", "timetz") == "10:30:00"


def test_oid_registry():
    assert OID_TO_NAME[16] == "bool"
    assert OID_TO_NAME[3802] == "jsonb"
    assert OID_TO_NAME[1007] == "_int4"
    assert len(OID_TO_NAME) > 100


# Every (oid, name) pair from the reference's name_for_type_id table
# (oid_database.ex:22-164 — public PG catalog constants, via epgsql).
# OID_TO_NAME is a strict superset: it adds range types, jsonpath,
# record, unknown, and pg_mcv_list that the reference lacks.
_REFERENCE_OID_TABLE = {
    16: "bool", 17: "bytea", 18: "char", 19: "name", 20: "int8",
    21: "int2", 22: "int2vector", 23: "int4", 24: "regproc", 25: "text",
    26: "oid", 27: "tid", 28: "xid", 29: "cid", 30: "oidvector",
    114: "json", 142: "xml", 143: "_xml", 194: "pg_node_tree",
    199: "_json", 210: "smgr", 600: "point", 601: "lseg", 602: "path",
    603: "box", 604: "polygon", 628: "line", 629: "_line", 650: "cidr",
    651: "_cidr", 700: "float4", 701: "float8", 702: "abstime",
    703: "reltime", 704: "tinterval", 718: "circle", 719: "_circle",
    774: "macaddr8", 775: "_macaddr8", 790: "money", 791: "_money",
    829: "macaddr", 869: "inet", 1000: "_bool", 1001: "_bytea",
    1002: "_char", 1003: "_name", 1005: "_int2", 1006: "_int2vector",
    1007: "_int4", 1008: "_regproc", 1009: "_text", 1010: "_tid",
    1011: "_xid", 1012: "_cid", 1013: "_oidvector", 1014: "_bpchar",
    1015: "_varchar", 1016: "_int8", 1017: "_point", 1018: "_lseg",
    1019: "_path", 1020: "_box", 1021: "_float4", 1022: "_float8",
    1023: "_abstime", 1024: "_reltime", 1025: "_tinterval",
    1027: "_polygon", 1028: "_oid", 1033: "aclitem", 1034: "_aclitem",
    1040: "_macaddr", 1041: "_inet", 1042: "bpchar", 1043: "varchar",
    1082: "date", 1083: "time", 1114: "timestamp", 1115: "_timestamp",
    1182: "_date", 1183: "_time", 1184: "timestamptz",
    1185: "_timestamptz", 1186: "interval", 1187: "_interval",
    1231: "_numeric", 1263: "_cstring", 1266: "timetz", 1270: "_timetz",
    1560: "bit", 1561: "_bit", 1562: "varbit", 1563: "_varbit",
    1700: "numeric", 1790: "refcursor", 2201: "_refcursor",
    2202: "regprocedure", 2203: "regoper", 2204: "regoperator",
    2205: "regclass", 2206: "regtype", 2207: "_regprocedure",
    2208: "_regoper", 2209: "_regoperator", 2210: "_regclass",
    2211: "_regtype", 2949: "_txid_snapshot", 2950: "uuid", 2951: "_uuid",
    2970: "txid_snapshot", 3220: "pg_lsn", 3221: "_pg_lsn",
    3361: "pg_ndistinct", 3402: "pg_dependencies", 3614: "tsvector",
    3615: "tsquery", 3642: "gtsvector", 3643: "_tsvector",
    3644: "_gtsvector", 3645: "_tsquery", 3734: "regconfig",
    3735: "_regconfig", 3769: "regdictionary", 3770: "_regdictionary",
    3802: "jsonb", 3807: "_jsonb", 3905: "_int4range", 3907: "_numrange",
    3909: "_tsrange", 3911: "_tstzrange", 3912: "daterange",
    3913: "_daterange", 3927: "_int8range", 4089: "regnamespace",
    4090: "_regnamespace", 4096: "regrole", 4097: "_regrole",
}


def test_oid_registry_reference_parity():
    """138/138 name_for_type_id parity with oid_database.ex:22-164."""
    assert len(_REFERENCE_OID_TABLE) == 138
    mismatched = {
        oid: (name, OID_TO_NAME.get(oid))
        for oid, name in _REFERENCE_OID_TABLE.items()
        if OID_TO_NAME.get(oid) != name
    }
    assert not mismatched, mismatched


def test_spark_type_mapping():
    from pyspark.sql import types as T

    assert spark_type_for("int8") == T.LongType()
    assert spark_type_for("_float8") == T.ArrayType(T.DoubleType())
    assert spark_type_for("jsonb") == T.StringType()
