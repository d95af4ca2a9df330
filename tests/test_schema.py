"""M1 schema system unit tests (no SparkSession needed).

Mirrors the offline tier of the reference's vendored-lib tests (SURVEY §5);
fixture follows FIXTURES.md §4 (describe_customer exercising every §1.2 type).
"""

import pytest
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    StringType,
    TimestampType,
)

from pgsf_spark.schema import (
    TableDesc,
    UnsupportedTypeError,
    describe_to_struct,
    generate_mapping_rows,
    parse_mapping_csv,
    select_cdc_timestamp,
    select_pk,
    sf_type_to_spark,
    write_mapping_csv,
)
from pgsf_spark.schema.mapping import SchemaError, sync_field_names


def f(name, type_, **kw):
    d = {"name": name, "type": type_, "nillable": True}
    d.update(kw)
    return d


DESCRIBE_CUSTOMER = [
    f("Id", "id", length=18, nillable=False),
    f("Name", "string", length=255, nillable=False),
    f("Email", "email", length=80, IsIndexed=True),
    f("Segment__c", "picklist"),
    f("Tags__c", "multipicklist"),
    f("EmployeeCount__c", "int"),
    f("Revenue__c", "currency", precision=18, scale=2),
    f("Score__c", "double"),
    f("Discount__c", "percent"),
    f("IsActive__c", "boolean", defaultValue=True),
    f("SignupDate__c", "date"),
    f("SystemModstamp", "datetime"),
    f("CreatedDate", "datetime"),
    f("IsDeleted", "boolean"),
    f("BillingAddress", "address"),
    f("BillingStreet", "string", length=255, compoundFieldName="BillingAddress"),
    f("BillingCity", "string", length=40, compoundFieldName="BillingAddress"),
    f("FullLabel__c", "string", calculated=True),
    f("Legacy__c", "anyType"),
    f("Secret__c", "encryptedstring", length=64),
    f("ExternalRef__c", "reference", length=18, unique=True),
]


class TestTypeMapping:
    def test_scalar_types(self):
        # createtable.py:13-35 dispatch, SURVEY §1.2
        assert isinstance(sf_type_to_spark(f("x", "string")), StringType)
        assert isinstance(sf_type_to_spark(f("x", "email")), StringType)
        assert isinstance(sf_type_to_spark(f("x", "picklist")), StringType)
        assert isinstance(sf_type_to_spark(f("x", "int")), IntegerType)
        assert isinstance(sf_type_to_spark(f("x", "date")), DateType)
        assert isinstance(sf_type_to_spark(f("x", "datetime")), TimestampType)
        assert isinstance(sf_type_to_spark(f("x", "boolean")), BooleanType)
        assert isinstance(sf_type_to_spark(f("x", "double")), DoubleType)
        assert isinstance(sf_type_to_spark(f("x", "percent")), DoubleType)
        assert isinstance(sf_type_to_spark(f("x", "anyType")), StringType)

    def test_currency_precision(self):
        t = sf_type_to_spark(f("x", "currency", precision=18, scale=2))
        assert t == DecimalType(18, 2)

    def test_unknown_type_fails_loudly(self):
        # reference emits '"<t>" NOT IMPLEMENTED' into DDL (createtable.py:35)
        with pytest.raises(UnsupportedTypeError):
            sf_type_to_spark(f("x", "geolocation"))

    def test_address_explodes_to_seven(self):
        # createtable.py:52-71: Address suffix stripped, 7 parts
        st = describe_to_struct([f("BillingAddress", "address")])
        names = [x.name for x in st.fields]
        assert names == [
            "BillingStreet",
            "BillingCity",
            "BillingState",
            "BillingPostalCode",
            "BillingCountry",
            "BillingLatitude",
            "BillingLongitude",
        ]
        assert isinstance(st["BillingLatitude"].dataType, DoubleType)
        assert st["BillingStreet"].metadata["maxlength"] == 255

    def test_nillable_maps_to_nullable(self):
        st = describe_to_struct([f("Id", "id", nillable=False), f("Email", "email")])
        assert not st["Id"].nullable
        assert st["Email"].nullable

    def test_metadata_carried(self):
        st = describe_to_struct([f("ExternalRef__c", "reference", length=18, unique=True, IsIndexed=True)])
        m = st["ExternalRef__c"].metadata
        assert m["maxlength"] == 18 and m["unique"] and m["indexed"]


class TestMapping:
    def test_defaults_exclude_calculated_and_compound_members(self):
        # tabledesc.py:176-193
        rows = generate_mapping_rows(DESCRIBE_CUSTOMER)
        imp = sync_field_names(rows)
        assert "FullLabel__c" not in imp  # calculated
        assert "BillingStreet" not in imp  # compound member
        assert "BillingAddress" not in imp  # compound parent
        assert "Id" in imp and "Name" in imp and "IsDeleted" in imp

    def test_id_dropped_when_durableid(self):
        # tabledesc.py:179-181
        fields = [f("Id", "id"), f("DurableId", "id"), f("SystemModstamp", "datetime")]
        imp = sync_field_names(generate_mapping_rows(fields))
        assert "Id" not in imp and "DurableId" in imp

    def test_minimal_mode(self):
        # tabledesc.py:156-175
        rows = generate_mapping_rows(DESCRIBE_CUSTOMER, minimal=True)
        assert set(sync_field_names(rows)) == {"Id", "CreatedDate", "IsDeleted", "SystemModstamp"}

    def test_csv_round_trip(self):
        rows = generate_mapping_rows(DESCRIBE_CUSTOMER)
        text = write_mapping_csv(rows)
        back = parse_mapping_csv(text)
        assert back == rows

    def test_bad_header_rejected(self):
        with pytest.raises(SchemaError):
            parse_mapping_csv("a,b,c\n1,2,3\n")

    def test_indexed_from_describe(self):
        rows = generate_mapping_rows(DESCRIBE_CUSTOMER)
        by = {r["FieldName"]: r for r in rows}
        assert by["Email"]["Indexed"] == "1"
        assert by["Name"]["Indexed"] == "0"


class TestKeySelection:
    def test_pk_prefers_durableid(self):
        # tabledesc.py:206-213
        assert select_pk(["Id", "DurableId"]) == "DurableId"
        assert select_pk(["Id"]) == "Id"
        with pytest.raises(SchemaError):
            select_pk(["foo"])

    def test_cdc_ts_priority(self):
        # tabledesc.py:215-225
        assert select_cdc_timestamp(["SystemModStamp", "CreatedDate"]) == "SystemModStamp"
        assert select_cdc_timestamp(["SystemModstamp"]) == "SystemModstamp"
        assert select_cdc_timestamp(["LastModifiedDate", "CreatedDate"]) == "LastModifiedDate"
        assert select_cdc_timestamp(["CreatedDate"]) == "CreatedDate"
        with pytest.raises(SchemaError):
            select_cdc_timestamp(["foo"])


class TestTableDesc:
    def test_end_to_end(self):
        td = TableDesc("Customer", DESCRIBE_CUSTOMER)
        assert td.pk == "Id"
        assert td.cdc_ts == "SystemModstamp"
        assert td.has_isdeleted
        schema = td.spark_schema()
        assert "FullLabel__c" not in schema.fieldNames()
        assert isinstance(schema["Revenue__c"].dataType, DecimalType)

    def test_schema_order_follows_mapping(self):
        td = TableDesc("Customer", DESCRIBE_CUSTOMER)
        assert td.spark_schema().fieldNames()[: len(td.sync_fields)] == td.sync_fields


class TestFieldDefinitionMerge:
    def test_isindexed_merged_by_name(self):
        # J3/S2 enrichment join (tabledesc.py:63-77)
        from pgsf_spark.schema.mapping import merge_field_definitions

        fields = [f("Email", "email"), f("Name", "string")]
        fielddefs = [
            {"QualifiedApiName": "Email", "IsIndexed": True},
            {"QualifiedApiName": "Ghost__c", "IsIndexed": True},  # unknown: ignored
        ]
        merged = merge_field_definitions(fields, fielddefs)
        by = {m["name"]: m for m in merged}
        assert by["Email"]["IsIndexed"] is True
        assert "IsIndexed" not in by["Name"]
