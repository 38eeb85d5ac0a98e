"""The MULTIVALUE stage: explode T24 multivalue fields 1-row → N-rows.

Reconstructs the observable contract of the reference's unseen
``MULTIVALUE`` template (src/controllers/index.js:413-445): its inputs
are the narrowed single-value projection (``listSelectedField``,
:424-442) and the quoted VM / VS field-name lists (:444-445); its output
stream is consumed by parsers that read single-value fields as top-level
columns (``DATA.F``, :447-560) and VM/VS fields from the map under their
*plain* name (``DATA.XMLRECORD['F']``, :191-198).

Spark realization (SURVEY.md §2.4): decode each VM/VS field to an array
with the T24 codec, ``arrays_zip`` them (positional alignment of parallel
multivalues — the T24 "associated multivalue set" convention), and
``posexplode_outer`` to rows. ``_outer`` keeps records whose multivalue
fields are all empty (a row with NULL elements) rather than dropping
them — documented assumption, verified behaviorally in tests.

The exploded row carries:
- ``recid`` and every narrowed single-value column (top-level),
- ``xmlrecord`` rebuilt as ``MAP<STRING,STRING>`` holding each VM/VS
  field's element for this row under its plain name,
- ``MV_POS`` — the 1-based multivalue ordinal (useful for sinks keyed by
  (RECID, position); ksqlDB arrays are 1-based).

All of it is native Catalyst (split/filter/arrays_zip/posexplode) —
generator pruning and column pruning apply; no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.t24 import mv_array
from .compiler import FieldSpec

# NOTE: the reference's listSelectedField also extracts a rename alias
# from FUNC-shaped transformations (src/controllers/index.js:430) — NOT
# ported on purpose: the narrowed column must stay aliased spec.name so
# the post-explode ExplodedResolver (which reads by spec.name) resolves;
# the sink projection applies the user-facing alias.
# transformations that read the _multivalue sibling key (:433-439)
_INDEX_RE = re.compile(r"^\[(.*)\]$")
_FUNC_INDEX_RE = re.compile(r"(.*)\(\[(.*)\](.*)\)")


def _single_source_key(spec: FieldSpec) -> str:
    """Which map key feeds a single-value field into the MULTIVALUE
    stage (the ``listSelectedField`` choice, src/controllers/index.js:
    424-442): multivalue-shaped transformations read ``name_multivalue``,
    everything else reads ``name``."""
    t = spec.transformation
    if "string-join" in t or _INDEX_RE.match(t) or _FUNC_INDEX_RE.search(t):
        return f"{spec.name}_multivalue"
    return spec.name


def explode_multivalue(
    df: DataFrame,
    single_specs: list[FieldSpec],
    vm_names: list[str],
    vs_names: list[str],
    xml_col: str = "xmlrecord",
    recid_col: str = "recid",
) -> DataFrame:
    """MAPPED → MULTIVALUE: one output row per VM element (VS subvalues
    are positionally aligned — zipped into the same explosion)."""
    mv_names = list(dict.fromkeys([*vm_names, *vs_names]))
    if not mv_names:
        return df

    # Pre-explode narrowing (the reference's hand-rolled column pruning,
    # src/controllers/index.js:424-442). Kept explicit for streaming
    # state-size control even though Catalyst would prune anyway.
    singles = []
    single_out_names: list[str] = []
    for spec in single_specs:
        if spec.name == "RECID":
            continue  # the key column is always carried; avoid a
            # case-insensitive clash with the recid column
        if spec.name == "INPUTTER_HIS":
            # the post-explode parser reads DATA.INPUTTER (:454)
            key, out = "INPUTTER_multivalue", "INPUTTER"
        else:
            key, out = _single_source_key(spec), spec.name
        if out in single_out_names:
            continue
        single_out_names.append(out)
        singles.append(F.element_at(F.col(xml_col), key).alias(out))

    def _mv_source(n: str):
        # the MAPPED stream carries multivalue payloads under the
        # `<NAME>_multivalue` sibling key (and usually also under the plain
        # name — FIXTURES.md §1); prefer the sibling, fall back to plain.
        return F.coalesce(
            F.element_at(F.col(xml_col), f"{n}_multivalue"),
            F.element_at(F.col(xml_col), n),
        )

    # A record may miss some VM/VS fields entirely; coalesce to an empty
    # array so one NULL doesn't null out the whole zip (arrays_zip pads
    # shorter arrays with NULL elements).
    zipped = F.arrays_zip(
        *[
            F.coalesce(mv_array(_mv_source(n)), F.array()).alias(n)
            for n in mv_names
        ]
    )
    exploded = df.select(
        F.col(recid_col),
        *singles,
        F.posexplode_outer(zipped).alias("__mv_pos", "__mv"),
    )
    rebuilt_map = F.map_from_arrays(
        F.array(*[F.lit(n) for n in mv_names]),
        F.array(*[F.col("__mv").getField(n) for n in mv_names]),
    )
    return exploded.select(
        F.col(recid_col),
        *[F.col(s) for s in single_out_names],
        rebuilt_map.alias(xml_col),
        (F.col("__mv_pos") + 1).cast("int").alias("MV_POS"),
    )
