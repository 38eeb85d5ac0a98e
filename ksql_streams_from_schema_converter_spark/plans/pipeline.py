"""The flagship pipeline: RAW → MAPPED → (MULTIVALUE) → SINK, as chained
DataFrame transforms.

This is the Spark-native equivalent of the reference's
``POST /api/etl-pipeline`` (src/controllers/index.js:10-623): where the
reference interpolates Couchbase-stored SQL templates with ``eval``
(:611-615) and returns five ksqlDB statements, this builds ONE lazy
logical plan — Catalyst fuses the stateless stages, so there are no
intermediate topics/materializations unless the caller asks for them.

Topology selection mirrors the reference exactly (:573-610):

- ``procType='XML'``          → map payload already parsed; VM/VS fields
                                 present → MULTIVALUE stage, else direct
                                 sink (:577-581).
- ``procType='BLOB'`` + FE    → hex → text → map, single-value sink (:585-590)
- ``procType='BLOB'`` + FEFD  → same decode, multi-or-single (:591-600)
- ``procType='BLOB'`` + SPLIT → whole decoded blob, blob-parser sink (:601-609)

Works identically on batch and streaming DataFrames (every transform is
stateless and stream-safe; see streaming/runner.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame

from ..functions.t24 import blob_hex_to_text, blob_to_map
from ..operators.compiler import (
    BlobResolver,
    CompileError,
    ExplodedResolver,
    FieldSpec,
    MappedResolver,
    compile_projection,
)
from ..operators.explode import explode_multivalue
from .ddl import generate_oracle_ddl


@dataclass
class PipelineSpec:
    """The ``POST /api/etl-pipeline`` request body
    (src/controllers/index.js:11-18) as a typed spec."""

    schema_name: str
    fields: list[FieldSpec]
    proc_type: str = "XML"  # 'XML' | 'BLOB'
    blob_delim: str | None = None  # 'FE' | 'FEFD' | 'SPLIT'
    proc_name: str = ""
    collection_name: str = ""

    @property
    def single_values(self) -> list[FieldSpec]:
        return [f for f in self.fields if f.should_parse_sv]

    @property
    def vms(self) -> list[FieldSpec]:
        return [f for f in self.fields if f.should_parse_vm]

    @property
    def vss(self) -> list[FieldSpec]:
        return [f for f in self.fields if f.should_parse_vs]

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineSpec":
        return cls(
            schema_name=d["schemaName"],
            fields=[FieldSpec.from_dict(f) for f in d.get("procData", [])],
            proc_type=d.get("procType", "XML"),
            blob_delim=d.get("blobDelim"),
            proc_name=d.get("procName", ""),
            collection_name=d.get("collectionName", ""),
        )


@dataclass
class PipelineResult:
    sink: DataFrame
    ddl: str
    added_fields: list[dict] = dc_field(default_factory=list)


class EtlPipeline:
    """Compile a :class:`PipelineSpec` and apply it to a raw CDC
    DataFrame (``recid STRING, xmlrecord MAP<STRING,STRING>`` for XML,
    ``recid STRING, value_hex STRING`` for BLOB — FIXTURES.md §1-2)."""

    def __init__(self, spec: PipelineSpec):
        self.spec = spec
        if spec.proc_type not in ("XML", "BLOB"):
            raise CompileError(f"unknown procType: {spec.proc_type!r}")
        if spec.proc_type == "BLOB" and spec.blob_delim not in ("FE", "FEFD", "SPLIT"):
            raise CompileError(f"unknown blobDelim: {spec.blob_delim!r}")

    # -- stages ------------------------------------------------------------

    def stage_mapped(self, raw: DataFrame) -> DataFrame:
        """RAW → MAPPED. XML payloads arrive pre-parsed as the map column
        (the unseen 'XML' template's contract, src/controllers/index.js:575);
        BLOB payloads are hex-decoded and, for FE/FEFD, parsed into the
        same map shape ('BLOB_PARSE_T24', :586-595); SPLIT keeps the whole
        decoded blob as one value ('BLOB_SPLIT', :601-606)."""
        s = self.spec
        if s.proc_type == "XML":
            return raw
        decoded = blob_hex_to_text("value_hex")
        if s.blob_delim in ("FE", "FEFD"):
            return raw.select("recid", blob_to_map(decoded).alias("xmlrecord"))
        return raw.select("recid", decoded.alias("blob"))

    def stage_multivalue(self, mapped: DataFrame) -> DataFrame:
        s = self.spec
        return explode_multivalue(
            mapped,
            s.single_values,
            [f.name for f in s.vms],
            [f.name for f in s.vss],
        )

    def stage_sink(self, df: DataFrame, exploded: bool) -> tuple[DataFrame, list[dict]]:
        s = self.spec
        if s.proc_type == "BLOB" and s.blob_delim == "SPLIT":
            groups = [(s.single_values, BlobResolver("blob"))]
        elif exploded:
            # singles read top-level columns (inline variant :447-560);
            # VM/VS read the rebuilt map under plain names (multiParser
            # :172-291) — concat order singles+vm+vs as at :563-566.
            in_map = MappedResolver(multivalue_suffix=False)
            groups = [
                (s.single_values, ExplodedResolver()),
                (s.vms, in_map),
                (s.vss, in_map),
            ]
        else:
            groups = [(s.single_values, MappedResolver())]
        cols, meta = [], []
        for specs, resolver in groups:
            c, m = compile_projection(specs, resolver, s.schema_name)
            cols.extend(c)
            meta.extend(m)
        return df.select(*cols), meta

    # -- end-to-end --------------------------------------------------------

    def apply(self, raw: DataFrame) -> PipelineResult:
        s = self.spec
        mapped = self.stage_mapped(raw)
        multivalued = bool(s.vms or s.vss) and not (
            s.proc_type == "BLOB" and s.blob_delim in ("FE", "SPLIT")
        )
        staged = self.stage_multivalue(mapped) if multivalued else mapped
        sink, meta = self.stage_sink(staged, exploded=multivalued)
        ddl = generate_oracle_ddl(
            f"{s.schema_name}_SINK", sink.schema, multivalue=multivalued
        )
        return PipelineResult(sink=sink, ddl=ddl, added_fields=meta)
