"""Single-record CRUD surface (operators/records.py): REST-verb parity with
the reference client library (api.py:591-713) over a versioned TableStore --
create/get/get_by_custom_id/update/upsert/delete, PATCH merge semantics,
404/300/400 error mapping, and the point-lookup pushdown."""

import pytest

from pgsf_spark.operators.records import (
    InvalidField,
    MultipleRecordsFound,
    RecordApi,
    RecordNotFound,
)


@pytest.fixture()
def api(tmp_store):
    return RecordApi(tmp_store, "contacts", pk="Id")


def _seed(api, n=3):
    made = [api.create({"name": f"n{i}", "ext": f"e{i}", "amount": i * 10}) for i in range(n)]
    return [m["id"] for m in made]


class TestCreateGet:
    def test_create_then_get_roundtrip(self, api):
        out = api.create({"name": "ada", "ext": "x1", "amount": 5})
        assert out["success"] is True and out["errors"] == []
        got = api.get(out["id"])
        assert got["name"] == "ada" and got["amount"] == 5 and got["Id"] == out["id"]

    def test_create_rejects_pk_in_payload(self, api):
        with pytest.raises(InvalidField, match="cannot be specified on create"):
            api.create({"Id": "boom", "name": "x"})

    def test_create_on_existing_table_rejects_unknown_field(self, api):
        _seed(api, 1)
        with pytest.raises(InvalidField, match="no column"):
            api.create({"name": "y", "nope": 1})

    def test_ids_are_reference_width(self, api):
        out = api.create({"name": "w", "ext": "e", "amount": 0})
        assert len(out["id"]) == 18

    def test_get_missing_raises_404(self, api):
        _seed(api, 1)
        with pytest.raises(RecordNotFound):
            api.get("absent-id")

    def test_each_mutation_publishes_a_version(self, api, tmp_store):
        ids = _seed(api, 2)
        v1 = tmp_store.current_version("contacts")
        api.update(ids[0], {"amount": 99})
        assert tmp_store.current_version("contacts") != v1


class TestTypedBootstrap:
    """First-ever write with an explicit schema (VERDICT r9 ask #5): a
    None-valued field must land as a typed NULL instead of blowing up
    single-dict inference, and an int field must get the DECLARED type,
    not inference's LongType."""

    @staticmethod
    def _schema():
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        return StructType(
            [
                StructField("Id", StringType(), False),
                StructField("name", StringType(), True),
                StructField("ext", StringType(), True),
                StructField("amount", IntegerType(), True),
            ]
        )

    def test_create_with_none_valued_field(self, tmp_store):
        api = RecordApi(tmp_store, "typed", pk="Id", bootstrap_schema=self._schema())
        out = api.create({"name": None, "ext": "e0", "amount": None})
        got = api.get(out["id"])
        assert got["name"] is None and got["amount"] is None
        # absent fields become typed NULLs too
        out2 = api.create({"ext": "e1"})
        assert api.get(out2["id"])["amount"] is None

    def test_declared_type_beats_inference(self, tmp_store):
        api = RecordApi(tmp_store, "typed2", pk="Id", bootstrap_schema=self._schema())
        api.create({"name": "a", "ext": "e", "amount": 7})
        [f] = [f for f in tmp_store.read("typed2").schema.fields if f.name == "amount"]
        assert f.dataType.simpleString() == "int"  # inference would say bigint

    def test_bootstrap_schema_validates_unknown_fields(self, tmp_store):
        api = RecordApi(tmp_store, "typed3", pk="Id", bootstrap_schema=self._schema())
        with pytest.raises(InvalidField, match="no column"):
            api.create({"nope": 1})

    def test_bootstrap_schema_must_contain_pk(self, tmp_store):
        from pyspark.sql.types import StringType, StructField, StructType

        with pytest.raises(InvalidField, match="must contain the pk"):
            RecordApi(
                tmp_store,
                "typed4",
                pk="Id",
                bootstrap_schema=StructType([StructField("name", StringType())]),
            )

    def test_upsert_bootstrap_is_typed_too(self, tmp_store):
        api = RecordApi(tmp_store, "typed5", pk="Id", bootstrap_schema=self._schema())
        assert api.upsert("ext", "e9", {"name": None, "amount": None}) == 201
        got = api.get_by_custom_id("ext", "e9")
        assert got["name"] is None and got["amount"] is None


class TestGetByCustomId:
    def test_unique_match(self, api):
        ids = _seed(api)
        got = api.get_by_custom_id("ext", "e1")
        assert got["Id"] == ids[1] and got["amount"] == 10

    def test_missing_raises_404(self, api):
        _seed(api)
        with pytest.raises(RecordNotFound):
            api.get_by_custom_id("ext", "zz")

    def test_ambiguous_raises_300(self, api):
        _seed(api)
        api.create({"name": "dup", "ext": "e1", "amount": 7})
        with pytest.raises(MultipleRecordsFound):
            api.get_by_custom_id("ext", "e1")

    def test_unknown_field_raises_400(self, api):
        _seed(api, 1)
        with pytest.raises(InvalidField):
            api.get_by_custom_id("nope", "v")


class TestUpdate:
    def test_patch_merges_named_fields_only(self, api):
        ids = _seed(api)
        assert api.update(ids[0], {"amount": 77}) == 204
        got = api.get(ids[0])
        # untouched fields survive the PATCH
        assert got["amount"] == 77 and got["name"] == "n0" and got["ext"] == "e0"

    def test_other_rows_untouched(self, api):
        ids = _seed(api)
        api.update(ids[0], {"amount": 77})
        assert api.get(ids[2])["amount"] == 20

    def test_update_missing_raises_404(self, api):
        _seed(api, 1)
        with pytest.raises(RecordNotFound):
            api.update("absent", {"amount": 1})

    def test_update_unknown_field_raises_400(self, api):
        ids = _seed(api, 1)
        with pytest.raises(InvalidField):
            api.update(ids[0], {"nope": 1})


class TestUpsert:
    def test_creates_when_absent(self, api):
        _seed(api, 1)
        assert api.upsert("ext", "fresh", {"name": "new", "amount": 3}) == 201
        got = api.get_by_custom_id("ext", "fresh")
        assert got["name"] == "new" and len(got["Id"]) == 18

    def test_updates_when_present(self, api):
        ids = _seed(api)
        assert api.upsert("ext", "e2", {"amount": 555}) == 204
        got = api.get(ids[2])
        # same identity, patched fields, kept fields
        assert got["amount"] == 555 and got["name"] == "n2" and got["ext"] == "e2"

    def test_ambiguous_raises_300(self, api):
        _seed(api)
        api.create({"name": "dup", "ext": "e1", "amount": 7})
        with pytest.raises(MultipleRecordsFound):
            api.upsert("ext", "e1", {"amount": 1})

    def test_upsert_bootstraps_missing_table(self, api, tmp_store):
        # upsert-first workflow: the verb must create the table like create
        assert not tmp_store.exists("contacts")
        assert api.upsert("ext", "first", {"name": "a", "amount": 1}) == 201
        assert api.get_by_custom_id("ext", "first")["name"] == "a"

    def test_upsert_rejects_pk_in_payload(self, api):
        # an honored payload pk on the create path could mint a DUPLICATE
        # key (the corruption class: get returns either row, delete removes
        # both); on the update path it is a silent re-key -- both 400
        ids = _seed(api, 1)
        with pytest.raises(InvalidField, match="cannot be specified on upsert"):
            api.upsert("ext", "fresh", {"Id": ids[0], "name": "dup"})


class TestRekeyAndNullPk:
    def test_update_rejects_rekey(self, api):
        ids = _seed(api, 2)
        with pytest.raises(InvalidField, match="cannot be changed"):
            api.update(ids[0], {"Id": ids[1], "amount": 1})

    def test_update_accepts_matching_pk_in_payload(self, api):
        ids = _seed(api, 1)
        assert api.update(ids[0], {"Id": ids[0], "amount": 42}) == 204
        assert api.get(ids[0])["amount"] == 42

    def test_mutations_preserve_null_pk_rows(self, api, tmp_store, spark):
        # bulk paths can land rows with a missing key; a single-record
        # mutation must never silently drop them (three-valued logic:
        # ~(NULL == id) filters the row out unless eqNullSafe is used)
        ids = _seed(api, 2)
        cur = tmp_store.read("contacts")
        vals = {"Id": None, "name": "orphan", "ext": "eo", "amount": 0}
        orphan = spark.createDataFrame(
            [tuple(vals[f.name] for f in cur.schema.fields)], schema=cur.schema
        )
        tmp_store.write(cur.unionByName(orphan), "contacts")
        api.delete(ids[0])
        api.update(ids[1], {"amount": 1})
        api.upsert("ext", "eo2", {"name": "new", "amount": 2})
        left = tmp_store.read("contacts")
        from pyspark.sql import functions as F

        assert left.filter(F.col("Id").isNull()).count() == 1


class TestDelete:
    def test_delete_removes_only_that_row(self, api):
        ids = _seed(api)
        assert api.delete(ids[1]) == 204
        with pytest.raises(RecordNotFound):
            api.get(ids[1])
        assert api.get(ids[0])["name"] == "n0"
        assert api.get(ids[2])["name"] == "n2"

    def test_delete_missing_raises_404(self, api):
        _seed(api, 1)
        with pytest.raises(RecordNotFound):
            api.delete("absent")


class TestPointLookupPushdown:
    def test_get_pushes_id_filter_to_scan(self, api, tmp_store):
        ids = _seed(api)
        from pyspark.sql import functions as F

        df = tmp_store.read("contacts").filter(F.col("Id") == F.lit(ids[0])).limit(2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "Id" in plan.split("PushedFilters")[1][:120]
