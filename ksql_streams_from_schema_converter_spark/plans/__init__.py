from .pipeline import EtlPipeline, PipelineResult, PipelineSpec  # noqa: F401
from .ddl import generate_oracle_ddl  # noqa: F401
from .registry import SchemaRegistry  # noqa: F401
