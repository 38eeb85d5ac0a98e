"""The field-transformation DSL compiler: spec → Spark ``Column``.

One compiler replaces the reference's four copy-pasted parsers
(``singleParser`` src/controllers/index.js:57-170, ``multiParser``
:172-291, ``singleSplitBlobParser`` :293-403, and the inline variant in
``multiHandler`` :447-560) — they differ only in how a field *name*
resolves to a source expression, which here is a pluggable
:class:`Resolver`.

The compiler works in Spark-SQL *text* internally (the DSL's ``$`` /
``$$`` / ``nested`` cases are textual substitution in the reference,
src/controllers/index.js:96-114,149-153) and produces a ``Column`` via
``F.expr`` — Catalyst parses and validates the result at plan-build time,
replacing the reference's ``eval``-on-stored-strings
(src/controllers/index.js:611-615) with fail-loudly compilation.

DSL branches implemented (reference line refs in each branch):

====================  =====================================================
``''``                identity map lookup (:73-74)
``string-join(sep)``  multivalue flatten + join (:75-83)
``parse_date``        ``to_date(c,'yyyyMMdd')`` (:84-85)
``parse_timestamp``   ``to_timestamp_ntz(c,'yyMMddHHmm')`` (:86-87; NTZ — ksqlDB timestamps are zoneless)
``substring``         fixed ``substring(c,1,35)`` (:88-89)
``seab_field``        2nd ``_``-token (:90-91)
``[n]``               1-based multivalue element, NULL out-of-range (:92-95)
``FUNC(args) alias``  whitelisted generic call, ``$``→source, ``$$``→name
                      literal (:96-114)
``FUNC([n] p) alias`` indexed element fed to FUNC, params auto-inferred
                      (:115-144)
verbatim fallback     raw SQL escape hatch, ksql-isms rewritten (:145-147)
``nested`` wrapper    outer expr with ``$``, may re-alias (:149-153)
``CAST``              applied when ``type[1] != 'string'`` (:155-157)
``INPUTTER_HIS``      hardcoded special case (:70-72)
====================  =====================================================
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.registry import FUNCTION_REGISTRY, UnknownFunctionError
from ..functions.t24 import INDEX_SPLIT, MULTIVALUE_SEP, ORDINAL_PREFIX


class CompileError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Field spec (the reference's procData element, src/controllers/index.js:57-65)
# ---------------------------------------------------------------------------


@dataclass
class FieldSpec:
    name: str
    transformation: str = ""
    type: tuple[str, str] = ("string", "string")
    nested: str = ""
    aliases: list[str] = dc_field(default_factory=list)
    doc: str = "S"
    is_added_field: bool = False
    should_parse_sv: bool = True
    should_parse_vm: bool = False
    should_parse_vs: bool = False

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "transformation": self.transformation,
            "type": list(self.type),
            "nested": self.nested,
            "aliases": self.aliases,
            "doc": self.doc,
            "isAddedField": self.is_added_field,
            "should_parse_sv": self.should_parse_sv,
            "should_parse_vm": self.should_parse_vm,
            "should_parse_vs": self.should_parse_vs,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "FieldSpec":
        t = d.get("type", ["string", "string"])
        return cls(
            name=d["name"],
            transformation=d.get("transformation", ""),
            type=(t[0], t[1]) if len(t) >= 2 else ("string", "string"),
            nested=d.get("nested", ""),
            aliases=list(d.get("aliases", [])),
            doc=d.get("doc", "S"),
            is_added_field=bool(d.get("isAddedField", d.get("is_added_field", False))),
            should_parse_sv=bool(d.get("should_parse_sv", True)),
            should_parse_vm=bool(d.get("should_parse_vm", False)),
            should_parse_vs=bool(d.get("should_parse_vs", False)),
        )


# ---------------------------------------------------------------------------
# Resolvers: field name -> source SQL expression
# ---------------------------------------------------------------------------


class MappedResolver:
    """Post-MAPPED stage: fields live in a ``MAP<STRING,STRING>`` column;
    multivalue fields also under the ``<NAME>_multivalue`` sibling key
    (src/controllers/index.js:74,78). ``RECID`` resolves to the business-key
    column, not the map (:104-105,131-132).

    ``multivalue_suffix=False`` gives the post-MULTIVALUE variant
    (``multiParser``, src/controllers/index.js:172-291): the map carries
    the exploded element under the *plain* key, so multivalue reads drop
    the ``_multivalue`` suffix (compare :78 with :191-198)."""

    def __init__(
        self,
        xml_col: str = "xmlrecord",
        recid_col: str = "recid",
        multivalue_suffix: bool = True,
    ):
        self.xml_col = xml_col
        self.recid_col = recid_col
        self.multivalue_suffix = multivalue_suffix

    def sql(self, name: str, multivalue: bool = False) -> str:
        # NOTE: identity on the name 'RECID' reads the map (reference :74);
        # only the FUNC branches override the source to DATA.RECID
        # (:104-105,131-132) — the compiler calls .recid() there.
        key = f"{name}_multivalue" if (multivalue and self.multivalue_suffix) else name
        return f"element_at({self.xml_col}, '{key}')"

    def recid(self) -> str:
        return self.recid_col


class ExplodedResolver:
    """Post-MULTIVALUE stage: fields are top-level columns (the exploded
    values), read as ``DATA.F`` in the reference's fourth parser variant
    (src/controllers/index.js:447-560)."""

    def __init__(self, recid_col: str = "recid"):
        self.recid_col = recid_col

    def sql(self, name: str, multivalue: bool = False) -> str:
        return f"`{name}`"

    def recid(self) -> str:
        return self.recid_col


class BlobResolver:
    """BLOB SPLIT mode: every field's source is the *whole decoded blob*;
    transformations carve fields out of it (``singleSplitBlobParser``,
    src/controllers/index.js:293-403, decode shape :307)."""

    def __init__(self, blob_sql: str, recid_col: str = "recid"):
        self.blob_sql = blob_sql
        self.recid_col = recid_col

    def sql(self, name: str, multivalue: bool = False) -> str:
        return self.blob_sql

    def recid(self) -> str:
        return self.recid_col


# ---------------------------------------------------------------------------
# ksql-SQL -> Spark-SQL text rewriting (for verbatim / nested / FUNC args)
# ---------------------------------------------------------------------------

_XMLRECORD_RE = re.compile(r"DATA\.XMLRECORD\s*\[\s*'([^']*)'\s*\]", re.IGNORECASE)
_DATA_PREFIX_RE = re.compile(r"\bDATA\.", re.IGNORECASE)
_FUNC_TOKEN_RE = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(")
# names whose ksql->spark translation differs (applied textually)
_RENAMES = {k: v for k, v in FUNCTION_REGISTRY.items() if v != k.lower() and not v.startswith("__")}


def _split_top_level(args: str) -> list[str]:
    """Split an argument list on top-level commas (quote/paren aware)."""
    out, depth, quote, cur = [], 0, None, []
    for ch in args:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _rewrite_call(name: str, args_text: str) -> str:
    """Rewrite one ``NAME(args)`` call (args already rewritten)."""
    upper = name.upper()
    if upper == "SEAB_FIELD":
        # SEAB_FIELD(x, d, n) -> try_element_at(split(x, d), n)
        parts = [p.strip() for p in _split_top_level(args_text)]
        if len(parts) != 3:
            raise CompileError(f"SEAB_FIELD expects 3 args, got: {args_text!r}")
        return f"try_element_at(split({parts[0]}, {parts[1]}), {parts[2]})"
    if upper == "SEAB_HEXTOTEXT":
        return f"decode({args_text}, 'ISO-8859-1')"
    mapped = _RENAMES.get(upper)
    return f"{mapped or name}({args_text})"


def rewrite_ksql_sql(text: str) -> str:
    """Rewrite ksqlDB-dialect SQL text to Spark-SQL text:

    - ``DATA.XMLRECORD['X']`` → ``element_at(xmlrecord, 'X')`` and other
      ``DATA.`` prefixes dropped (ksqlDB stream alias);
    - lambda arrow ``=>`` → ``->`` (``FILTER``/``TRANSFORM`` lambdas,
      src/controllers/index.js:78,93);
    - whitelisted function renames (``UCASE``→``upper``, ``PARSE_DATE``→
      ``to_date``, ``REGEXP_SPLIT_TO_ARRAY``→``split``, …) including the
      structural ``SEAB_*`` rewrites.

    Unknown function names are left for Catalyst to validate at
    plan-build time (fail-loud, unlike the reference's ``eval``).
    """
    text = _XMLRECORD_RE.sub(lambda m: f"element_at(xmlrecord, '{m.group(1)}')", text)
    text = _DATA_PREFIX_RE.sub("", text)
    text = text.replace("=>", "->")

    # Rewrite function calls inside-out with a simple scanner.
    def rewrite(s: str) -> str:
        m = _FUNC_TOKEN_RE.search(s)
        if not m:
            return s
        # find the matching close paren for the call at m.end()-1
        start = m.end()  # after '('
        depth, i, quote = 1, start, None
        while i < len(s) and depth:
            ch = s[i]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            return s  # unbalanced; let Catalyst complain
        inner = rewrite(s[start : i - 1])
        call = _rewrite_call(m.group(1), inner)
        return s[: m.start()] + call + rewrite(s[i:])

    return rewrite(text)


# ---------------------------------------------------------------------------
# SQL templates for the multivalue codec (text twins of functions/t24.py)
# ---------------------------------------------------------------------------


def mv_array_sql(src: str) -> str:
    return (
        f"filter(split(regexp_replace({src}, '{ORDINAL_PREFIX}', ''), "
        f"'{MULTIVALUE_SEP}'), x -> x != '')"
    )


def mv_join_sql(src: str, sep: str) -> str:
    return f"array_join({mv_array_sql(src)}, '{sep}')"


def mv_index_arr_sql(src: str) -> str:
    return f"filter(split({src}, '{INDEX_SPLIT}'), x -> x != '')"


def mv_index_sql(src: str, n: str) -> str:
    return f"try_element_at({mv_index_arr_sql(src)}, {n})"


def inputter_his_sql(src: str) -> str:
    # src/controllers/index.js:70-72; ksqlDB ARRAY_JOIN renders NULL
    # elements as 'null' -> Spark needs the explicit null replacement.
    return (
        "substring(regexp_replace(array_join(transform(split("
        f"regexp_replace({src}, '{ORDINAL_PREFIX}', ''), '#(s?[0-9]*:)?'), "
        "x -> try_element_at(split(x, '_'), 2)), ' ', 'null'), 'null ', ''), 1, 4000)"
    )


# ---------------------------------------------------------------------------
# Type mapping (ksqlDB / Oracle-ish target names -> Spark cast targets)
# ---------------------------------------------------------------------------

_TYPE_MAP = {
    "string": "string",
    "varchar": "string",
    "varchar2": "string",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "bytes": "binary",
}
_DECIMAL_RE = re.compile(r"^(decimal|number|numeric)\s*(\(\s*\d+\s*(,\s*\d+\s*)?\))?$", re.IGNORECASE)


def map_cast_type(t: str) -> str:
    low = t.strip().lower()
    if low in _TYPE_MAP:
        return _TYPE_MAP[low]
    m = _DECIMAL_RE.match(low)
    if m:
        return "decimal" + (m.group(2).replace(" ", "") if m.group(2) else "(38,18)")
    raise CompileError(f"unsupported cast target type: {t!r}")


# ---------------------------------------------------------------------------
# The compiler
# ---------------------------------------------------------------------------

_STRING_JOIN_SEP_RE = re.compile(r"\('*([^']*)'*\)$")
_INDEX_RE = re.compile(r"^\[(.*)\]$")
_FUNC_RE = re.compile(r"^([^\s(]*)\((.*)\)\s*(.*)$", re.DOTALL)
_FUNC_INDEX_ARGS_RE = re.compile(r"^\[(.*)\](.*)$", re.DOTALL)
_NESTED_RE = re.compile(r"(^.*\))\s*(.*$)", re.DOTALL)
_ALIAS_PART_RE = re.compile(r"^c(\d*)(?:_m(\d*))*$")


@dataclass
class CompiledField:
    sql: str
    out_name: str
    added_field: dict | None = None

    @property
    def column(self) -> Column:
        return F.expr(self.sql).alias(self.out_name)


def _added_field_meta(
    spec: FieldSpec, schema_name: str, out_name: str = ""
) -> dict | None:
    """The ``-- add field`` Oracle-dictionary side-channel
    (src/controllers/index.js:42-54,159-167): structured metadata plus
    the reference's exact comment string (``comment`` key, rendered by
    plans.ddl.added_field_comment) for artifact-level parity."""
    from ..plans.ddl import added_field_comment

    if not spec.is_added_field:
        return None
    alias0 = spec.aliases[0] if spec.aliases else ""
    comment = added_field_comment(
        schema_name, spec.name, alias0, spec.doc, out_name=out_name
    )
    if not alias0:
        return {"name": spec.name, "note": "add field (no alias)", "comment": comment}
    m = _ALIAS_PART_RE.match(alias0)
    if not m:
        return {"name": spec.name, "note": "INPUT FORMAT ERROR", "comment": comment}
    return {
        "name": spec.name,
        "alias": alias0,
        "prefix": "FBNK",
        "table_name": schema_name.replace("_", "."),
        "field_name": spec.name.replace("_", "."),
        "field_fm": m.group(1) or None,
        "field_vm": m.group(2) or None,
        "field_single_multi": spec.doc or "S",
        "data_type": "VARCHAR2",
        "comment": comment,
    }


def compile_field(spec: FieldSpec, resolver, schema_name: str = "") -> CompiledField:
    name, t = spec.name, spec.transformation
    field_name = name.split("LOCALREF_", 1)[1] if name.startswith("LOCALREF_") else name
    sql: str

    if name == "INPUTTER_HIS" and not isinstance(resolver, BlobResolver):
        # the blob-SPLIT parser has NO INPUTTER_HIS special case
        # (src/controllers/index.js:293-403 starts at the transformation
        # branches) — there the name goes through normal routing
        sql = inputter_his_sql(resolver.sql("INPUTTER", multivalue=True))
        field_name = "INPUTTER_HIS"
    elif t == "":
        sql = resolver.sql(name)
    elif "string-join" in t:  # checked before FUNC, as in the reference (:75)
        m = _STRING_JOIN_SEP_RE.search(t)
        sep = m.group(1) if m else " "
        sql = mv_join_sql(resolver.sql(name, multivalue=True), sep)
    elif t == "parse_date":
        sql = f"to_date({resolver.sql(name)}, 'yyyyMMdd')"
    elif t == "parse_timestamp":
        # to_timestamp_NTZ: ksqlDB's TIMESTAMP has no timezone, and a
        # zoned result would shift with the collecting process's tz
        sql = f"to_timestamp_ntz({resolver.sql(name)}, 'yyMMddHHmm')"
    elif t == "substring":
        sql = f"substring({resolver.sql(name)}, 1, 35)"
    elif t == "seab_field":
        src = resolver.sql(name)
        sql = f"try_element_at(split({src}, '_'), 2)"
    elif m := _INDEX_RE.match(t):
        sql = mv_index_sql(resolver.sql(name, multivalue=True), m.group(1).strip())
    elif (m := _FUNC_RE.match(t)) and ("$" in m.group(2) or _FUNC_INDEX_ARGS_RE.match(m.group(2).strip())):
        # FUNC-shaped without '$' or a leading '[n]' falls through to the
        # verbatim branch below: the reference leaves `output` undefined
        # there and emits the literal string "undefined" (latent bug,
        # src/controllers/index.js:96-144); verbatim is the useful reading.
        func_name, args, alias = m.group(1), m.group(2), m.group(3)
        upper = func_name.upper()
        if upper not in FUNCTION_REGISTRY:
            raise UnknownFunctionError(
                f"function {func_name!r} is not whitelisted (field {name!r})"
            )
        field_name = alias.strip()
        if "$" in args:
            # NB: the reference also checks `includes('string-join')` here
            # to pick the multivalue source (:106-108), but that check is
            # unreachable — any transformation containing 'string-join'
            # was already consumed by the string-join branch above, in
            # both the reference's chain and this one. Not ported.
            src = resolver.recid() if name == "RECID" else resolver.sql(name)
            if "$$" in args:
                substituted = args.replace("$$", name)
            else:
                substituted = args.replace("$", src)
            sql = rewrite_ksql_sql(f"{upper}({substituted})")
        elif m2 := _FUNC_INDEX_ARGS_RE.match(args.strip()):
            idx, rest = m2.group(1).strip(), m2.group(2)
            src = resolver.recid() if name == "RECID" else resolver.sql(name, multivalue=True)
            params = None
            if "parse_date" in t:
                params = ", 'yyyyMMdd'"
            elif "parse_timestamp" in t:
                params = ", 'yyMMddHHmm'"
            elif "substring" in t:
                params = ",1,35"
            elif "seab_field" in t:
                params = ",'_',2"
            if re.search(r"[^,\s]", rest):
                params = rest
            element = mv_index_sql(src, idx)
            sql = rewrite_ksql_sql(f"{upper}({element}{params or ''})")
        else:  # unreachable: guarded in the elif condition
            raise CompileError(f"unsupported FUNC form: {t!r} (field {name!r})")
    else:
        # Verbatim fallback (src/controllers/index.js:145-147). The
        # reference returns the raw line immediately — skipping nested /
        # CAST / aliasing — so we do the same, aliasing only for the
        # DataFrame column name.
        return CompiledField(
            sql=rewrite_ksql_sql(t),
            out_name=(field_name.upper() or name),
            added_field=_added_field_meta(
                spec, schema_name, out_name=(field_name.upper() or name)
            ),
        )

    if "$" in spec.nested:
        m = _NESTED_RE.match(spec.nested)
        if not m:
            raise CompileError(f"nested wrapper must end with ')': {spec.nested!r}")
        wrapper = rewrite_ksql_sql(m.group(1))
        sql = wrapper.replace("$", sql)
        field_name = m.group(2).strip() or field_name

    if spec.type[1] != "string":
        sql = f"CAST({sql} AS {map_cast_type(spec.type[1])})"

    return CompiledField(
        sql=sql,
        out_name=(field_name.upper() or name),
        added_field=_added_field_meta(
            spec, schema_name, out_name=(field_name.upper() or name)
        ),
    )


def compile_projection(
    specs: list[FieldSpec], resolver, schema_name: str = ""
) -> tuple[list[Column], list[dict]]:
    """Compile a list of field specs to select-list columns + added-field
    metadata (the reference's ``selectedFields`` join,
    src/controllers/index.js:410,563-566)."""
    cols, meta = [], []
    for spec in specs:
        cf = compile_field(spec, resolver, schema_name)
        cols.append(cf.column)
        if cf.added_field:
            meta.append(cf.added_field)
    return cols, meta
