from pgsf_spark.sync.state import SyncState, SyncRow  # noqa: F401
from pgsf_spark.sync.runner import SyncRunner  # noqa: F401
