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


def test_spark_type_mapping():
    from pyspark.sql import types as T

    assert spark_type_for("int8") == T.LongType()
    assert spark_type_for("_float8") == T.ArrayType(T.DoubleType())
    assert spark_type_for("jsonb") == T.StringType()
