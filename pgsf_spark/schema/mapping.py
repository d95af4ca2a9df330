"""Mapping-file (field curation) logic + PK / CDC-timestamp selection.

Reference parity:
  - mapping CSV read:      /root/reference/tabledesc.py:96-124
  - mapping CSV generate:  /root/reference/tabledesc.py:147-204
  - PK selection:          /root/reference/tabledesc.py:206-213
  - CDC ts selection:      /root/reference/tabledesc.py:215-225

The mapping file is a per-table CSV ``FieldName,Import,Indexed,Note``: rows
with Import=1 are synchronized, Indexed=1 request an index (a Z-ORDER /
bucketing hint on Spark). Pure functions, unit-testable without Spark.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql.types import StructType

from pgsf_spark.schema.sftypes import describe_to_struct

MAPPING_HEADER = ["FieldName", "Import", "Indexed", "Note"]

# Minimal-mode import set (tabledesc.py:156-158,167-175).
MINIMAL_FIELDS = ("Id", "DurableId", "CreatedDate", "IsDeleted", "SystemModstamp")

# CDC timestamp candidates, in priority order (tabledesc.py:215-225).
CDC_TS_CANDIDATES = ("SystemModStamp", "SystemModstamp", "LastModifiedDate", "CreatedDate")


class SchemaError(ValueError):
    pass


def merge_field_definitions(fields: list[dict[str, Any]], fielddefs: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """J3/S2: enrich describe fields with FieldDefinition metadata by name
    (the reference merges IsIndexed this way -- tabledesc.py:63-77).

    Driver-side dict join: the field list is catalog metadata (hundreds of
    rows), never data. Unknown names in fielddefs are ignored, matching the
    reference's defensive merge."""
    by_name = {d.get("QualifiedApiName", d.get("name")): d for d in fielddefs}
    out = []
    for f in fields:
        fd = by_name.get(f["name"])
        merged = dict(f)
        if fd and "IsIndexed" in fd:
            merged["IsIndexed"] = fd["IsIndexed"]
        out.append(merged)
    return out


def generate_mapping_rows(fields: list[dict[str, Any]], minimal: bool = False) -> list[dict[str, str]]:
    """Generate default mapping rows from a describe field list.

    Defaults (tabledesc.py:176-193): import everything except calculated
    (formula) fields and compound *members* (fields carrying
    ``compoundFieldName``); drop ``Id`` when ``DurableId`` exists
    (tabledesc.py:179-181). ``minimal=True`` imports only MINIMAL_FIELDS.
    Compound *parents* (type=address) are kept in the file but default to
    Import=0 (tabledesc.py:185-187).
    """
    names = {f["name"] for f in fields}
    has_durable = "DurableId" in names
    rows = []
    for f in fields:
        name = f["name"]
        t = str(f.get("type", "")).lower()
        note = ""
        imp = 1
        if minimal:
            imp = 1 if name in MINIMAL_FIELDS else 0
        if f.get("calculated"):
            imp, note = 0, "calculated (formula) field: compute locally if needed"
        if f.get("compoundFieldName"):
            imp, note = 0, f"member of compound {f['compoundFieldName']}"
        if t == "address":
            imp, note = 0, "compound parent"
        if name == "Id" and has_durable:
            imp, note = 0, "DurableId is used as the key"
        indexed = 1 if f.get("IsIndexed") else 0
        rows.append({"FieldName": name, "Import": str(imp), "Indexed": str(indexed), "Note": note})
    return rows


def write_mapping_csv(rows: list[dict[str, str]]) -> str:
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=MAPPING_HEADER, quoting=csv.QUOTE_ALL)
    w.writeheader()
    w.writerows(rows)
    return buf.getvalue()


def parse_mapping_csv(text: str) -> list[dict[str, str]]:
    """Parse a mapping CSV; returns rows as dicts (all values str)."""
    rdr = csv.DictReader(io.StringIO(text))
    if rdr.fieldnames is None or [c.strip() for c in rdr.fieldnames] != MAPPING_HEADER:
        raise SchemaError(f"bad mapping header: {rdr.fieldnames!r}, want {MAPPING_HEADER}")
    return [dict(r) for r in rdr]


def sync_field_names(mapping_rows: list[dict[str, str]]) -> list[str]:
    """Field names with Import=1, in file order (tabledesc.py:96-109)."""
    return [r["FieldName"] for r in mapping_rows if str(r.get("Import", "0")).strip() == "1"]


def indexed_field_names(mapping_rows: list[dict[str, str]]) -> list[str]:
    return [
        r["FieldName"]
        for r in mapping_rows
        if str(r.get("Import", "0")).strip() == "1" and str(r.get("Indexed", "0")).strip() == "1"
    ]


def select_pk(field_names: list[str]) -> str:
    """``DurableId`` if present else ``Id``; error if neither (tabledesc.py:206-213)."""
    if "DurableId" in field_names:
        return "DurableId"
    if "Id" in field_names:
        return "Id"
    raise SchemaError("no primary key: neither DurableId nor Id in field list")


def select_cdc_timestamp(field_names: list[str]) -> str:
    """First CDC-timestamp candidate present; error if none (tabledesc.py:215-225)."""
    for cand in CDC_TS_CANDIDATES:
        if cand in field_names:
            return cand
    raise SchemaError(f"no CDC timestamp column among {CDC_TS_CANDIDATES}")


@dataclass
class TableDesc:
    """Curated description of one replicated entity.

    The Spark analogue of the reference's TableDesc (tabledesc.py:17-22):
    describe fields + mapping rows -> sync projection, key, CDC column,
    Spark schema.
    """

    name: str
    fields: list[dict[str, Any]] = field(default_factory=list)
    mapping: list[dict[str, str]] | None = None

    def __post_init__(self) -> None:
        if self.mapping is None:
            self.mapping = generate_mapping_rows(self.fields)

    @property
    def sync_fields(self) -> list[str]:
        return sync_field_names(self.mapping)

    @property
    def indexed_fields(self) -> list[str]:
        return indexed_field_names(self.mapping)

    @property
    def pk(self) -> str:
        return select_pk(self.sync_fields)

    @property
    def cdc_ts(self) -> str:
        return select_cdc_timestamp(self.sync_fields)

    @property
    def has_isdeleted(self) -> bool:
        # Soft-delete handling is conditional on IsDeleted being synced
        # (query_poll_table.py:139-145).
        return "IsDeleted" in self.sync_fields

    def spark_schema(self) -> StructType:
        return describe_to_struct(self.fields, sync_field_names=self.sync_fields)
