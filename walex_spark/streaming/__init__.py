from walex_spark.streaming.txn_assembly import assemble_transactions  # noqa: F401
from walex_spark.streaming.engine import WalExEngine  # noqa: F401
