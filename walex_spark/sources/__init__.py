from walex_spark.sources.envelope import read_envelope, read_envelope_stream  # noqa: F401
from walex_spark.sources.jdbc import JdbcPollingSource  # noqa: F401
