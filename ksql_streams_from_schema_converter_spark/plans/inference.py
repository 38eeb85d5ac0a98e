"""Schema inference over raw CDC records (the BASELINE.json approach
names "schema inference" as part of the Spark-native design).

The reference never infers anything — schemas are hand-authored
Couchbase documents fetched at request time
(``/root/reference/src/services/index.js:31-41``). Authoring those specs
for T24 applications with hundreds of fields is exactly the manual step
an engine can remove, so :func:`infer_field_specs` derives the field
specs (§1.4 of SURVEY.md) from the data itself: given a MAPPED-shape
DataFrame (``xmlrecord: map<string,string>``), one distributed
statistics pass per field classifies

- multivalue vs subvalue vs single-value (``_multivalue`` sibling keys;
  ``s``-prefixed ordinals mark the subvalue dimension),
- ``parse_date`` (yyyyMMdd) / ``parse_timestamp`` (yyMMddHHmm),
- numeric target types (``bigint`` / sized ``decimal(p,s)``),
- identity strings otherwise,

and emits ``FieldSpec``s that feed straight into ``PipelineSpec`` /
``EtlPipeline``. Multivalue element types are inferred from the
*decoded elements* (second pass over exploded arrays, reusing the T24
codec), not the packed strings.

Scale: both passes are plain explode → groupBy aggregations — exact
counts, so inference is deterministic for a given input regardless of
partitioning, and the shuffle carries one row per distinct field name.
On a 100 TB topic you run it over ``df.sample(...)`` or one day of
records; nothing below materializes data on the driver except the
per-field stats row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.t24 import mv_array
from ..operators.compiler import FieldSpec

MV_SUFFIX = "_multivalue"

_DATE_RE = r"^[0-9]{8}$"
_TS_RE = r"^[0-9]{10}$"
_INT_RE = r"^-?[0-9]+$"
_DEC_RE = r"^-?[0-9]+\.[0-9]+$"
# any ordinal prefix or '#' separator marks a packed multivalue string
_MV_RE = r"^s?[0-9]+:|#"
# a LEADING 's'-prefixed ordinal marks a pure subvalue field; a VM field
# can still carry embedded '#sN:' subvalue markers mid-string
_SV_RE = r"^s[0-9]+:"


def _pattern_stats(kv: DataFrame):
    """Per-(tag, key) pattern counts over non-empty values. Exact
    aggregates → deterministic; one row per distinct field name per tag
    comes back, all in ONE shuffle + collect."""
    v = F.col("v")
    is_int = v.rlike(_INT_RE)
    is_dec = v.rlike(_DEC_RE)
    # the expensive parses/extracts run only on rows whose cheap shape
    # check passes (F.when short-circuits per row)
    return (
        kv.groupBy("tag", "k")
        .agg(
            F.count("*").alias("n"),
            F.count_if(
                F.when(v.rlike(_DATE_RE), F.try_to_timestamp(v, F.lit("yyyyMMdd"))).isNotNull()
            ).alias("n_date"),
            F.count_if(
                F.when(v.rlike(_TS_RE), F.try_to_timestamp(v, F.lit("yyMMddHHmm"))).isNotNull()
            ).alias("n_ts"),
            F.count_if(is_int).alias("n_int"),
            F.count_if(is_dec).alias("n_dec"),
            F.max(
                F.when(is_int | is_dec, F.length(F.regexp_extract(v, r"^-?([0-9]+)", 1)))
            ).alias("int_digits"),
            F.max(
                F.when(is_dec, F.length(F.regexp_extract(v, r"\.([0-9]+)$", 1)))
            ).alias("frac_digits"),
            F.count_if(v.rlike(_SV_RE)).alias("n_sv"),
        )
        .collect()
    )


def _target_type(r, min_match: float) -> tuple[str, str]:
    """(transformation, target_type) for a stats row: the dominant
    pattern wins when ≥ ``min_match`` of non-empty values match it."""
    thresh = r.n * min_match
    if r.n_date >= thresh:
        return "parse_date", "date"
    if r.n_ts >= thresh:
        return "parse_timestamp", "timestamp"
    if r.n_int >= thresh and r.int_digits <= 18:
        return "", "bigint"
    if r.n_int + r.n_dec >= thresh:
        p = min(38, (r.int_digits or 0) + (r.frac_digits or 0))
        return "", f"decimal({max(p, 1)},{r.frac_digits or 0})"
    return "", "string"


def infer_field_specs(
    cdc: DataFrame,
    xml_col: str = "xmlrecord",
    min_match: float = 0.99,
    include_recid: bool = True,
) -> list[FieldSpec]:
    """Infer the field-spec list (SURVEY.md §1.4) from MAPPED-shape CDC
    data. Returns specs sorted by field name (RECID first), ready for
    ``PipelineSpec(schema_name=..., fields=...)``."""
    kv = cdc.select(F.explode(F.col(xml_col)).alias("k", "v")).where(F.length("v") > 0)

    base_key = F.expr(f"substring(k, 1, length(k) - {len(MV_SUFFIX)})")
    plain = kv.where(~F.col("k").endswith(MV_SUFFIX)).select(
        F.lit("plain").alias("tag"), "k", "v"
    )
    packed = kv.where(F.col("k").endswith(MV_SUFFIX))
    # multivalue keys: classify vm/vs from the packed string ('packed'
    # rows), but infer the TYPE from the decoded elements ('elem' rows —
    # the packed '1:..#2:..' string would never look numeric/date-like)
    marks = packed.select(F.lit("packed").alias("tag"), base_key.alias("k"), "v")
    elements = (
        packed.select(base_key.alias("k"), F.explode(mv_array(F.col("v"))).alias("v"))
        .where(F.length("v") > 0)
        .select(F.lit("elem").alias("tag"), "k", "v")
    )
    # one stats pass over the union → a single shuffle + collect instead
    # of three sequential jobs
    rows = _pattern_stats(plain.unionByName(marks).unionByName(elements))
    by_tag: dict[str, list] = {"plain": [], "packed": [], "elem": []}
    for r in rows:
        by_tag[r.tag].append(r)

    specs: list[FieldSpec] = []
    if include_recid:
        specs.append(FieldSpec(name="RECID"))

    for r in sorted(by_tag["plain"], key=lambda r: r.k):
        transformation, target = _target_type(r, min_match)
        specs.append(
            FieldSpec(
                name=r.k,
                transformation=transformation,
                type=("string", target),
            )
        )

    sv_marks = {r.k: r for r in by_tag["packed"]}
    for r in sorted(by_tag["elem"], key=lambda r: r.k):
        transformation, target = _target_type(r, min_match)
        mark = sv_marks[r.k]
        is_sv = mark.n_sv >= mark.n * min_match
        specs.append(
            FieldSpec(
                name=r.k,
                transformation=transformation,
                type=("string", target),
                should_parse_sv=False,
                should_parse_vm=not is_sv,
                should_parse_vs=is_sv,
            )
        )
    return specs
