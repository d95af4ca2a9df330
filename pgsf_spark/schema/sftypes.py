"""Source-catalog (Salesforce describe) -> Spark StructType mapping.

Implements the type table of SURVEY.md §1.2 exactly. Reference parity:
  - PG type dispatch:       /root/reference/createtable.py:13-35
  - compound address split: /root/reference/createtable.py:52-71
  - value conversion:       /root/reference/query_poll_table.py:26-50

Pure functions, no SparkSession needed -- fully unit-testable.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class UnsupportedTypeError(TypeError):
    """Raised at schema-build time for an unmapped source type.

    The reference emits a literal ``"<type>" NOT IMPLEMENTED`` into the DDL so
    that table creation fails loudly (createtable.py:35); we fail earlier.
    """


# SF type name -> constructor(field_dict) -> Spark DataType
_STRING_TYPES = frozenset(
    {
        "combobox",
        "email",
        "encryptedstring",
        "id",
        "phone",
        "reference",
        "string",
        "textarea",
        "url",
    }
)
_TEXT_TYPES = frozenset({"picklist", "multipicklist", "anytype"})

# Compound address explodes to 7 columns (suffix, type, max length).
# Reference: createtable.py:52-71.
ADDRESS_PARTS: tuple[tuple[str, DataType, int | None], ...] = (
    ("Street", StringType(), 255),
    ("City", StringType(), 40),
    ("State", StringType(), 80),
    ("PostalCode", StringType(), 20),
    ("Country", StringType(), 80),
    ("Latitude", DoubleType(), None),
    ("Longitude", DoubleType(), None),
)


def sf_type_to_spark(field: dict[str, Any]) -> DataType:
    """Map one source field-describe dict to a Spark DataType.

    Mirrors createtable.py:13-35 (PG dispatch) with the Spark targets from
    SURVEY.md §1.2. ``address`` is handled by :func:`explode_address`, not
    here -- passing one raises, like any other non-scalar.
    """
    t = str(field.get("type", "")).lower()
    if t in _STRING_TYPES or t in _TEXT_TYPES:
        return StringType()
    if t == "int":
        # Reference uses INTEGER (createtable.py:21-22); IntegerType is the
        # faithful mapping. Values that need 64 bits should be declared long
        # upstream.
        return IntegerType()
    if t == "long":
        # not a reference describe type -- emitted by Engine._infer_fields for
        # parquet bigint columns so inferred schemas keep their 64-bit width
        # instead of narrowing to int (ADVICE r1)
        return LongType()
    if t == "date":
        return DateType()
    if t == "datetime":
        return TimestampType()
    if t == "boolean":
        return BooleanType()
    if t == "currency":
        precision = int(field.get("precision") or 18)
        scale = int(field.get("scale") or 0)
        # Spark caps DecimalType precision at 38.
        return DecimalType(min(precision, 38), min(scale, 37))
    if t in ("double", "percent"):
        return DoubleType()
    raise UnsupportedTypeError(f"source type {t!r} NOT IMPLEMENTED (field {field.get('name')})")


def _field_metadata(field: dict[str, Any]) -> dict[str, Any]:
    """Carry catalog attributes Spark can't express structurally.

    Mirrors what the reference folds into DDL: length (VARCHAR(n)),
    DEFAULT (createtable.py:38-45,72-84), UNIQUE, IsIndexed
    (tabledesc.py:63-77, createtable.py:111-123), calculated
    (tabledesc.py:176-193).
    """
    meta: dict[str, Any] = {}
    # picklist/multipicklist/anyType sizes are "not reliable"
    # (createtable.py:23-24 maps them to TEXT, discarding length) -- dropping
    # the metadata here keeps the PG round-trip (jdbc_sink.pg_type) faithful.
    skip_len = str(field.get("type", "")).lower() in _TEXT_TYPES
    for key, out in (
        ("length", "maxlength"),
        ("unique", "unique"),
        ("calculated", "calculated"),
        ("defaultValue", "default"),
        ("IsIndexed", "indexed"),
        ("compoundFieldName", "compoundFieldName"),
    ):
        if out == "maxlength" and skip_len:
            continue
        v = field.get(key)
        if v not in (None, "", 0, False):
            meta[out] = v
    return meta


def explode_address(field: dict[str, Any]) -> list[StructField]:
    """Explode a compound ``address`` field into its 7 scalar columns.

    The ``Address`` suffix is stripped from the base name before appending
    the part suffix (createtable.py:56-59): ``BillingAddress`` ->
    ``BillingStreet``, ``BillingCity``, ... All parts nullable.
    """
    base = field["name"]
    if base.endswith("Address"):
        base = base[: -len("Address")]
    out = []
    for suffix, dtype, maxlen in ADDRESS_PARTS:
        meta = {"compoundOf": field["name"]}
        if maxlen:
            meta["maxlength"] = maxlen
        out.append(StructField(base + suffix, dtype, nullable=True, metadata=meta))
    return out


def describe_to_struct(
    fields: list[dict[str, Any]],
    sync_field_names: list[str] | None = None,
    explode_compound: bool = True,
) -> StructType:
    """Build the table StructType from a describe field list.

    Args:
      fields: the ``fields`` array of a describe document (each a dict with
        name/type/length/precision/scale/nillable/defaultValue/unique/
        calculated/compoundFieldName, optionally IsIndexed merged in --
        tabledesc.py:53-77).
      sync_field_names: if given, only these fields are included, in this
        order (the curated ``Import=1`` projection, tabledesc.py:96-124).
      explode_compound: explode ``address`` fields into 7 scalar columns
        (faithful mode). When False, address fields raise.

    nillable -> nullable; catalog extras land in StructField.metadata.
    """
    by_name = {f["name"]: f for f in fields}
    ordered: list[dict[str, Any]]
    if sync_field_names is not None:
        missing = [n for n in sync_field_names if n not in by_name]
        if missing:
            raise KeyError(f"sync fields not in describe: {missing}")
        ordered = [by_name[n] for n in sync_field_names]
    else:
        ordered = list(fields)

    out: list[StructField] = []
    for f in ordered:
        t = str(f.get("type", "")).lower()
        if t == "address":
            if not explode_compound:
                raise UnsupportedTypeError(f"compound address field {f['name']} with explode_compound=False")
            out.extend(explode_address(f))
            continue
        nullable = bool(f.get("nillable", True))
        out.append(StructField(f["name"], sf_type_to_spark(f), nullable=nullable, metadata=_field_metadata(f)))
    return StructType(out)
