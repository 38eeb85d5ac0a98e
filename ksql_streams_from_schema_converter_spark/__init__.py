"""PySpark-native analytics engine with the data-processing capabilities of
phamduongw/ksql-streams-from-schema-converter (reference read-only at /root/reference).

The reference generates ksqlDB streaming-SQL pipelines for Temenos T24
CDC records (reference: src/controllers/index.js). This package implements
the semantics of those generated pipelines *natively* on Spark:

- ``functions.t24``   — the T24 multivalue codec + scalar functions as
  native Column builders (no Python UDFs in the hot path).
- ``operators.compiler`` — the field-transformation DSL compiler
  (one compiler replaces the reference's four copy-pasted parsers,
  reference: src/controllers/index.js:57-170,172-291,293-403,447-560).
- ``plans.pipeline``  — the RAW → MAPPED → MULTIVALUE → SINK topology
  (reference template names, src/controllers/index.js:407-422,567-610)
  as chained DataFrame transforms.
- ``operators.{dedup,similarity,text,pretrain}`` — large-scale
  training-data pipeline operators (dedup, ANN search and int8
  quantization, text analysis / PII scrub / chunking, benchmark
  decontamination, sequence packing).
- ``streaming.runner`` — the same pipelines under Structured Streaming.
"""

__version__ = "0.1.0"
