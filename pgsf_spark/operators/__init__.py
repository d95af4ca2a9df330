from pgsf_spark.operators.merge import latest_per_key, merge_upsert  # noqa: F401
from pgsf_spark.operators.table_store import TableStore  # noqa: F401
