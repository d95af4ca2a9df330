"""pgsf_spark — a PySpark-native analytics/replication engine.

Re-expresses the capabilities of the reference replication engine
(nirgal/pgsf: Salesforce -> PostgreSQL batch ETL + incremental CDC)
as an idiomatic Spark DataFrame engine, and extends it with the
large-scale analytics operators a 100 TB training-data pipeline
needs (dedup, similarity search, text analysis, multimodal columns).

Layout:
  schema/     -- describe-JSON -> StructType, mapping files, PK/CDC-ts selection
  sources/    -- entity source over parquet (projection/filter/limit pushdown),
                 pgsf CSV dialect I/O
  operators/  -- merge upsert (join-rewrite), latest-per-key dedup, snapshot load
  sync/       -- __sync state table + incremental sync runner + scheduler
  soql.py     -- SOQL-subset -> DataFrame translator
  analytics/  -- relational queries, dedup, similarity, text, multimodal
"""

__version__ = "0.1.0"

from pgsf_spark.session import get_spark  # noqa: F401
