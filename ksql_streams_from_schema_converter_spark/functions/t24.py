"""T24 multivalue codec + the reference's custom scalar functions, as
native Catalyst ``Column`` builders — no Python UDFs.

The T24 multivalue string encoding (reconstructed from the regexes the
reference emits, reference src/controllers/index.js:78,82,93):

- a value string may carry an ordinal prefix ``N:`` (multivalue) or
  ``sN:`` (subvalue), e.g. ``"1:VND100#2:USD200#s3:EUR300"``;
- elements are separated by ``#`` optionally followed by the next
  element's ordinal prefix;
- decoding = strip the leading ordinal, split on ``#(s?[0-9]+:)?``,
  drop empty elements.

Everything here compiles to built-in Spark expressions so it stays inside
whole-stage codegen and scales to arbitrary data sizes without a Python
round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regexes exactly as the reference emits them (src/controllers/index.js:78,93).
ORDINAL_PREFIX = r"^s?[0-9]+:"
MULTIVALUE_SEP = r"#(s?[0-9]+:)?"
# The [n] index path splits on prefix-or-separator in one pass
# (src/controllers/index.js:93).
INDEX_SPLIT = r"(^s?[0-9]+:|#(s?[0-9]+:)?)"
# INPUTTER_HIS uses a ``*`` quantifier variant (src/controllers/index.js:71).
INPUTTER_SEP = r"#(s?[0-9]*:)?"


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def mv_array(c: Column | str) -> Column:
    """Decode a T24 multivalue string to ``ARRAY<STRING>``.

    Mirrors ``FILTER(REGEXP_SPLIT_TO_ARRAY(REGEXP_REPLACE(c,'^s?[0-9]+:',''),
    '#(s?[0-9]+:)?'), X => X <> '')`` (src/controllers/index.js:78).
    """
    c = _as_col(c)
    stripped = F.regexp_replace(c, ORDINAL_PREFIX, "")
    return F.filter(F.split(stripped, MULTIVALUE_SEP), lambda x: x != "")


def mv_join(c: Column | str, sep: str = " ") -> Column:
    """``string-join`` DSL case: flatten a multivalue string to one
    ``sep``-delimited string (src/controllers/index.js:75-83)."""
    return F.array_join(mv_array(c), sep)


def mv_element(c: Column | str, n: int) -> Column:
    """``[n]`` DSL case: n-th element (1-based, NULL out of range —
    ksqlDB array-index semantics; src/controllers/index.js:92-95).

    Uses the one-pass prefix-or-separator split the reference uses for
    this path (slightly different from :func:`mv_array`: it also splits
    a mid-string ``s?N:`` that directly follows ``#``)."""
    c = _as_col(c)
    arr = F.filter(F.split(c, INDEX_SPLIT), lambda x: x != "")
    return F.try_element_at(arr, F.lit(n))


def seab_field(c: Column | str, delim: str = "_", n: int = 2) -> Column:
    """The reference's custom ksqlDB UDF ``SEAB_FIELD(c, delim, n)``:
    split on ``delim`` and return the n-th token (1-based, null-safe) —
    behavior inferred from the INPUTTER usage at
    src/controllers/index.js:71,90-91. Pure native expression here."""
    c = _as_col(c)
    return F.try_element_at(F.split(c, delim), F.lit(n))


def inputter_his(c: Column | str) -> Column:
    """The hardcoded INPUTTER_HIS special case
    (src/controllers/index.js:70-72):

    ``SUBSTRING(REGEXP_REPLACE(ARRAY_JOIN(TRANSFORM(REGEXP_SPLIT_TO_ARRAY(
    REGEXP_REPLACE(c,'^s?[0-9]+:',''), '#(s?[0-9]*:)?'), x =>
    SEAB_FIELD(x,'_',2)), ' '), 'null ', ''), 1, 4000)``

    ksqlDB's ARRAY_JOIN renders NULL elements as the string ``null``
    (which the generated expression then strips via the ``'null '``
    replace); Spark's array_join *skips* nulls unless given a
    null-replacement — so we pass ``'null'`` explicitly to keep parity.
    """
    c = _as_col(c)
    stripped = F.regexp_replace(c, ORDINAL_PREFIX, "")
    parts = F.split(stripped, INPUTTER_SEP)
    seconds = F.transform(parts, lambda x: F.try_element_at(F.split(x, "_"), F.lit(2)))
    joined = F.array_join(seconds, " ", "null")
    return F.substring(F.regexp_replace(joined, "null ", ""), 1, 4000)


XML_TAG_PATTERN = r"<([A-Za-z0-9_.]+)>([^<]*)</"


def xml_to_map(c: Column | str) -> Column:
    """Parse a T24 XMLRECORD payload (``<FIELD>value</FIELD>`` pairs)
    into ``MAP<STRING,STRING>`` — the MAPPED stage's 'XML' template
    contract (src/controllers/index.js:575; consumed as
    ``DATA.XMLRECORD['F']`` at :74).

    Uses a backreference-free tag regex so the same pattern runs on
    engines with RE2-style regex (the test oracle). Values containing
    nested ``<`` are not supported — T24 OFS XML payloads are flat
    tag/value records. Duplicate tags follow Spark's map-key dedup
    policy (default: error) — multivalue fields should arrive under
    distinct ``_multivalue`` tags as the reference expects."""
    c = _as_col(c)
    names = F.regexp_extract_all(c, F.lit(XML_TAG_PATTERN), 1)
    values = F.regexp_extract_all(c, F.lit(XML_TAG_PATTERN), 2)
    return F.map_from_arrays(names, values)


def blob_hex_to_text(c: Column | str, charset: str = "ISO-8859-1") -> Column:
    """``SEAB_HEXTOTEXT(FROM_BYTES(c, 'hex'))``
    (src/controllers/index.js:307) folded into one native expression:
    hex string → bytes → text. Default charset is ISO-8859-1 because the
    T24 OFS byte delimiters 0xFE/0xFD are not valid UTF-8 sequences."""
    c = _as_col(c)
    return F.decode(F.unhex(c), charset)


def blob_to_map(c: Column | str, field_delim: str = "þ", value_delim: str = "ý") -> Column:
    """Decode a T24 BLOB payload into ``MAP<STRING,STRING>``.

    The BLOB variants use 0xFE as field marker and 0xFD as value marker
    (blobDelim FE / FEFD, src/controllers/index.js:585,591). A decoded
    blob looks like ``NAME1<FD>value1<FE>NAME2<FD>value2``; this splits
    fields on the FE delimiter and name/value on the FD delimiter.
    """
    c = _as_col(c)
    pairs = F.split(c, field_delim)
    pairs = F.filter(pairs, lambda kv: kv != "")
    keys = F.transform(pairs, lambda kv: F.element_at(F.split(kv, value_delim, 2), 1))
    vals = F.transform(pairs, lambda kv: F.try_element_at(F.split(kv, value_delim, 2), F.lit(2)))
    return F.map_from_arrays(keys, vals)
