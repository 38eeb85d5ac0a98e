"""Service-surface parity with the reference's Express endpoints.

The reference is an HTTP service (src/routes/index.js:6-12); a user of
it interacts through five endpoints. This module is the same surface as
a Python facade over the engine — each function documents the endpoint
it replaces:

=============================  =============================================
``POST /api/etl-pipeline``     :func:`etl_pipeline` — compiles the request
                               into an executable pipeline (the reference
                               returns ksqlDB SQL strings to run elsewhere,
                               src/controllers/index.js:10-623; we return
                               the bound DataFrame + DDL + dictionary rows)
``GET /api/proc-data``         :func:`get_proc_data` — schema fetch by name
                               (src/controllers/index.js:4-7)
``GET/POST/DELETE templates``  :func:`get_templates` / :func:`update_templates`
                               / :func:`get_template` — template CRUD
                               (src/services/index.js:43-79). The engine
                               doesn't *execute* templates (they became code
                               paths, plans/pipeline.py; SURVEY.md §7) but
                               the storage contract is kept for migration
                               parity via :class:`TemplateRegistry`.
``POST /api/execute``          :func:`execute` — raw query passthrough;
                               the reference hands N1QL to Couchbase
                               (src/services/index.js:82-90), we hand SQL
                               to Catalyst
``GET /api/createTestData``    :func:`create_test_data` — fixture seeding
                               (src/services/index.js:93-99)
=============================  =============================================
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .plans.pipeline import EtlPipeline, PipelineResult, PipelineSpec
from .plans.registry import SchemaRegistry, TemplateRegistry
from .sources.parquet import register_views


@dataclass
class EtlPipelineResponse:
    """What the reference answers with five SQL strings
    (src/controllers/index.js:616-622), we answer with executables."""

    pipeline: EtlPipeline
    result: PipelineResult | None  # bound when a source DataFrame was given

    @property
    def stmt_ddl(self) -> str | None:
        return self.result.ddl if self.result else None


def etl_pipeline(request: dict, source: DataFrame | None = None) -> EtlPipelineResponse:
    """``POST /api/etl-pipeline``: accepts the reference's request body
    shape verbatim ({collectionName, procName, schemaName, procType,
    blobDelim, procData}) and compiles it. If ``source`` is given the
    pipeline is bound and executable immediately."""
    spec = PipelineSpec.from_dict(request)
    pipeline = EtlPipeline(spec)
    result = pipeline.apply(source) if source is not None else None
    return EtlPipelineResponse(pipeline=pipeline, result=result)


def get_proc_data(registry: SchemaRegistry, schema_name: str) -> dict:
    """``GET /api/proc-data?schemaName=X``: point lookup in the schema
    registry, same response shape as the reference ({schema_name,
    fields})."""
    fields = registry.get(schema_name)
    return {
        "schema_name": schema_name,
        "fields": [f.to_dict() for f in fields],
    }


def get_templates(registry: TemplateRegistry) -> list[dict]:
    """``GET`` all templates: ``{template_name, template}`` rows
    (src/services/index.js:43-52)."""
    return registry.get_all()


def update_templates(registry: TemplateRegistry, templates: list[dict]) -> None:
    """``POST`` bulk template upsert/delete (src/services/index.js:54-68):
    truthy ``template`` upserts, falsy deletes, per-item errors skipped."""
    registry.update_all(templates)


def get_template(registry: TemplateRegistry, template_name: str) -> str:
    """``GET`` one template by name, backtick-escaped like the reference
    (src/services/index.js:70-79)."""
    return registry.get_by_name(template_name)


def execute(spark: SparkSession, query: str) -> DataFrame:
    """``POST /api/execute``: raw query passthrough. Catalyst parses /
    analyzes / optimizes / executes natively (the reference delegates
    this wholesale to Couchbase's N1QL engine)."""
    return spark.sql(query)


def create_test_data(spark: SparkSession, sf_dir: str) -> list[str]:
    """``GET /api/createTestData``: register the fixture tables as views
    so :func:`execute` queries can reference them by name. Returns the
    registered names. (The reference re-seeds its Couchbase templates
    here — and passes no collection name, a latent bug,
    src/services/index.js:96; there are no templates to seed on Spark.)"""
    register_views(spark, sf_dir)
    from .sources.parquet import TABLE_NAMES

    return list(TABLE_NAMES)
