"""JDBC PostgreSQL sink: the reference's real replica target, Spark-native.

Reference flow (/root/reference/csv_to_postgres.py:48-97 full load;
/root/reference/query_poll_table.py:107-152,175-198 incremental):
  - full load:  TRUNCATE target; COPY csv files in
  - incremental: CREATE TEMP TABLE tmp_T (LIKE T); COPY changes into tmp_T;
                 INSERT INTO T SELECT ... FROM tmp_T [WHERE NOT IsDeleted]
                   ON CONFLICT (pk) DO UPDATE SET (cols) = (EXCLUDED.cols);
                 DELETE FROM T WHERE pk IN (SELECT pk FROM tmp_T WHERE IsDeleted);
                 DROP tmp_T -- one transaction.

Spark mapping: ``df.write.jdbc`` replaces the CSV download + COPY (executors
stream partitions concurrently over N JDBC connections -- the cluster-parallel
COPY), and the merge statements run server-side exactly as in the reference.
Statement EXECUTION is pluggable (``run_sql``): production uses a JDBC
connection via the JVM gateway (requires the PostgreSQL driver jar on the
Spark classpath); tests inject a recorder, and the live tier is gated on
``PGSF_TEST_PG_DSN`` like the vendored client's gated-live tests
(libs/salesforce-bulk/.../test_salesforce_bulk.py:207-220).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pgsf_spark.operators.merge import latest_per_key


def escape_ident(name: str) -> str:
    """PostgreSQL identifier quoting (pg.escape_name semantics)."""
    return '"' + name.replace('"', '""') + '"'


def pg_literal(value) -> str:
    """Render a Python value as a PostgreSQL literal (DEFAULT clauses).
    Reference: createtable.py:38-45 (postgres_const) + pg.escape_str."""
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    raise TypeError(f"no PostgreSQL literal form for {type(value).__name__}")


def pg_type(field: T.StructField) -> str:
    """Spark StructField -> PostgreSQL column type.

    The inverse of the describe->Spark mapping (schema/sftypes.py), matching
    the reference's PG dispatch (createtable.py:13-35): strings carry their
    catalog length back out as VARCHAR(n) (metadata ``maxlength``; TEXT when
    unbounded -- picklist/anyType in the reference), DecimalType -> NUMERIC,
    double -> DOUBLE PRECISION.
    """
    dt = field.dataType
    if isinstance(dt, T.StringType):
        n = field.metadata.get("maxlength") if field.metadata else None
        return f"VARCHAR({int(n)})" if n else "TEXT"
    if isinstance(dt, T.IntegerType) or isinstance(dt, T.ShortType):
        return "INTEGER"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DecimalType):
        return f"NUMERIC({dt.precision}, {dt.scale})"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE PRECISION"
    if isinstance(dt, T.FloatType):
        return "REAL"
    if isinstance(dt, T.BinaryType):
        return "BYTEA"
    raise TypeError(f'"{dt.simpleString()}" NOT IMPLEMENTED (column {field.name})')


def pg_create_table_sql(
    schema: T.StructType,
    table: str,
    pk: str | None = "Id",
    grant_to: str | None = None,
) -> list[str]:
    """CREATE TABLE + CREATE INDEX + GRANT statements for a fresh PG target.

    Faithful to get_pgsql_create (createtable.py:87-127): the pk column gets
    PRIMARY KEY (and no redundant NOT NULL/index); other columns get
    NOT NULL from nullability, DEFAULT/UNIQUE from catalog metadata; catalog
    ``indexed`` fields get a ``<table>_<col>_idx`` CREATE INDEX; optional
    GRANT SELECT. Column order follows the schema (the curated projection)."""
    coldefs = []
    for f in schema.fields:
        d = f" {escape_ident(f.name)} {pg_type(f)}"
        meta = f.metadata or {}
        if pk is not None and f.name == pk:
            d += " PRIMARY KEY"
        else:
            if not f.nullable:
                d += " NOT NULL"
            if meta.get("default") not in (None, ""):
                d += " DEFAULT " + pg_literal(meta["default"])
            if meta.get("unique"):
                d += " UNIQUE"
        coldefs.append(d)
    stmts = [
        "CREATE TABLE {} (\n{}\n);".format(escape_ident(table), ",\n".join(coldefs))
    ]
    for f in schema.fields:
        if f.name == pk:
            continue  # primary key already indexed
        if (f.metadata or {}).get("indexed"):
            stmts.append(
                "CREATE INDEX {} ON {} ({});".format(
                    escape_ident(f"{table}_{f.name}_idx"),
                    escape_ident(table),
                    escape_ident(f.name),
                )
            )
    if grant_to is not None:
        stmts.append(f"GRANT SELECT ON {escape_ident(table)} TO {grant_to};")
    return stmts


def staging_table_name(table: str) -> str:
    return f"tmp_{table}"


def full_load_sql(table: str) -> list[str]:
    """DDL-preserving full refresh: truncate, then the JDBC append lands the
    snapshot (mode='append' into the truncated table keeps indexes/grants,
    exactly what TRUNCATE+COPY does in the reference)."""
    return [f"TRUNCATE TABLE {escape_ident(table)}"]


def merge_sql(
    table: str,
    columns: list[str],
    pk: str,
    isdeleted_col: str | None = "IsDeleted",
) -> list[str]:
    """The reference's staged-merge statements (query_poll_table.py:107-152),
    parameterized on the staged table written by ``stage_changes``.

    ``columns`` are the TARGET columns (no staging-only helpers); the upsert
    applies non-deleted rows, then every key with a deleted row in the batch
    is removed -- delete beats same-batch update, as in the reference.
    """
    tmp = staging_table_name(table)
    collist = ", ".join(escape_ident(c) for c in columns)
    setlist = ", ".join(
        f"{escape_ident(c)} = EXCLUDED.{escape_ident(c)}" for c in columns if c != pk
    )
    stmts = []
    where_alive = ""
    if isdeleted_col:
        where_alive = f" WHERE NOT COALESCE({escape_ident(isdeleted_col)}, FALSE)"
    stmts.append(
        f"INSERT INTO {escape_ident(table)} ({collist}) "
        f"SELECT {collist} FROM {escape_ident(tmp)}{where_alive} "
        f"ON CONFLICT ({escape_ident(pk)}) DO UPDATE SET {setlist}"
    )
    if isdeleted_col:
        stmts.append(
            f"DELETE FROM {escape_ident(table)} WHERE {escape_ident(pk)} IN "
            f"(SELECT {escape_ident(pk)} FROM {escape_ident(tmp)} "
            f"WHERE COALESCE({escape_ident(isdeleted_col)}, FALSE))"
        )
    stmts.append(f"DROP TABLE {escape_ident(tmp)}")
    return stmts


class JdbcPostgresSink:
    """Replicate into a live PostgreSQL over JDBC.

    ``url`` is a ``jdbc:postgresql://host/db`` URL; ``properties`` carries
    user/password/driver. ``run_sql`` executes a statement list in one
    transaction server-side; when None, a JVM-gateway JDBC connection is used
    (needs the PG driver jar -- absent in this test environment, hence
    pluggable).
    """

    def __init__(
        self,
        url: str,
        properties: dict[str, str] | None = None,
        run_sql: Callable[[list[str]], None] | None = None,
        batchsize: int = 10_000,
    ):
        self.url = url
        self.properties = dict(properties or {})
        self.properties.setdefault("driver", "org.postgresql.Driver")
        self.properties.setdefault("batchsize", str(batchsize))
        self._run_sql = run_sql

    # -- statement execution -------------------------------------------------
    def run_sql(self, statements: list[str]) -> None:
        if self._run_sql is not None:
            self._run_sql(statements)
            return
        self._run_sql_jvm(statements)

    def _run_sql_jvm(self, statements: list[str]) -> None:
        """Single-transaction execution through the driver JVM (the same
        classpath that df.write.jdbc uses, so one driver jar serves both)."""
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        jvm = spark._sc._jvm  # noqa: SLF001 -- sanctioned gateway use
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            if k != "driver":
                props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            for sql in statements:
                st.execute(sql)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    # -- load paths ----------------------------------------------------------
    # NOTE on naming: df.write.jdbc always receives escape_ident(name) so the
    # writer and the generated SQL resolve the SAME relation -- unquoted,
    # PostgreSQL would fold 'tmp_Account' to 'tmp_account' while the merge
    # statements target "tmp_Account" (every Salesforce object is mixed-case).

    def create_target(
        self, schema, table: str, pk: str | None = "Id", grant_to: str | None = None
    ) -> list[str]:
        """Create a fresh PG target from the Spark schema (createtable.py
        parity: VARCHAR(n)/NUMERIC/PK/indexes/GRANT). Returns the DDL run."""
        stmts = pg_create_table_sql(schema, table, pk=pk, grant_to=grant_to)
        self.run_sql(stmts)
        return stmts

    def full_load(
        self,
        df: DataFrame,
        table: str,
        truncate_first: bool = True,
        create: bool = False,
        pk: str | None = "Id",
        grant_to: str | None = None,
    ) -> None:
        """Full refresh (csv_to_postgres.py:48-97): optionally CREATE the
        target first (createtable.py flow), then TRUNCATE (DDL preserved) +
        executor-parallel JDBC append -- the cluster-parallel COPY."""
        if create:
            self.create_target(df.schema, table, pk=pk, grant_to=grant_to)
        if truncate_first:
            self.run_sql(full_load_sql(table))
            df.write.jdbc(self.url, escape_ident(table), mode="append", properties=self.properties)
        else:
            df.write.jdbc(self.url, escape_ident(table), mode="overwrite", properties=self.properties)

    def stage_changes(self, changes: DataFrame, table: str) -> str:
        """Land the change batch in the staging table (the COPY into tmp_T).
        mode='overwrite' recreates the staging table from the batch schema."""
        tmp = staging_table_name(table)
        changes.write.jdbc(self.url, escape_ident(tmp), mode="overwrite", properties=self.properties)
        return tmp

    def staged_merge(
        self,
        changes: DataFrame,
        table: str,
        pk: str,
        ts_field: str,
        target_columns: list[str] | None = None,
        order_col: str | None = "_file_order",
        isdeleted_col: str | None = "IsDeleted",
    ) -> list[str]:
        """Incremental merge: dedup to latest-per-key Spark-side (PG's
        row-at-a-time ON CONFLICT semantics, precomputed set-at-once), stage,
        then run the reference's merge transaction. Returns the statements it
        executed (for logging parity with the reference's debug output)."""
        latest = latest_per_key(changes, pk, ts_field, order_col=order_col)
        helper_cols = {order_col, isdeleted_col} - {None}
        cols = target_columns or [c for c in changes.columns if c not in helper_cols]
        stage_cols = list(cols) + (
            [isdeleted_col] if isdeleted_col and isdeleted_col in changes.columns else []
        )
        self.stage_changes(latest.select(*stage_cols), table)
        stmts = merge_sql(
            table,
            cols,
            pk,
            isdeleted_col=isdeleted_col if isdeleted_col in stage_cols else None,
        )
        self.run_sql(stmts)
        return stmts
