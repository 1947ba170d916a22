from walex_spark.functions.pg_types import (  # noqa: F401
    OID_TO_NAME,
    pg_cast,
    pg_record_struct,
    spark_type_for,
)
from walex_spark.functions.array_parser import parse_pg_array  # noqa: F401
