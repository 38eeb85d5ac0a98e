"""Fuzzy (edit-distance) string matching with blocking.

The entity-resolution / record-linkage primitive a data pipeline needs
when keys are dirty: find pairs of strings within a small Levenshtein
distance WITHOUT the all-pairs cross join.  Standard blocking practice
(prefix + length band — the q-gram/prefix-filtering family, e.g.
Gravano et al., "Approximate string joins in a database (almost) for
free", VLDB 2001): two strings within edit distance ``k`` can differ
in length by at most ``k``, and unless an edit touches the first
``prefix_len`` characters they share the exact prefix.  Blocking on
(prefix, length band) therefore bounds each comparison group while
keeping recall exact for edits outside the prefix — the deterministic
contract the DuckDB oracle mirrors clause for clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def levenshtein_pairs(
    df: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    max_dist: int = 2,
    prefix_len: int = 4,
) -> DataFrame:
    """Pairs ``(id_a, id_b, dist)`` with ``levenshtein ≤ max_dist``,
    discovered inside (prefix, length-band) blocks.

    Scale: ONE equi-join shuffle keyed on the ``prefix_len``-char
    block key; the length-band inequality (``|len(a)-len(b)| ≤
    max_dist``, a necessary condition for edit distance ≤ max_dist)
    prunes within the block before the quadratic Levenshtein DP runs,
    and ``F.levenshtein``'s optional threshold form short-circuits the
    DP at ``max_dist`` — per-cell cost O(max_dist·len), not O(len²).
    A hot prefix block is ordinary join skew (AQE splits it).  Recall
    is exact for pairs agreeing on the first ``prefix_len`` chars;
    edits inside the prefix need a second pass on a different block
    key (suffix or rotated prefix — standard multi-pass blocking),
    which callers opt into by unioning passes.
    """
    return _blocked_pairs(
        df,
        F.substring(F.col(name_col), 1, prefix_len),
        name_col=name_col,
        id_col=id_col,
        max_dist=max_dist,
    )


def levenshtein_pairs_multipass(
    df: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    max_dist: int = 2,
    prefix_len: int = 4,
) -> DataFrame:
    """Two-pass blocked fuzzy match: the prefix pass plus a SUFFIX
    pass, unioned and de-duplicated.  A single edit cannot touch both
    the first and the last ``prefix_len`` characters of strings longer
    than ``2*prefix_len``, so for ``max_dist=1`` the two passes
    together give EXACT recall on such strings; for higher distances
    they cover every pair whose edits avoid one of the two anchors —
    the standard multi-pass blocking escalation the single-pass
    docstring names.  Cost: two bucketed joins instead of one, still
    never all-pairs."""
    prefix = levenshtein_pairs(
        df, name_col=name_col, id_col=id_col, max_dist=max_dist, prefix_len=prefix_len
    )
    suffix = _blocked_pairs(
        df,
        F.substring(F.col(name_col), -prefix_len, prefix_len),
        name_col=name_col,
        id_col=id_col,
        max_dist=max_dist,
    )
    return prefix.unionByName(suffix).dropDuplicates(["id_a", "id_b"])


def _blocked_pairs(
    df: DataFrame,
    block_expr,
    name_col: str,
    id_col: str,
    max_dist: int,
) -> DataFrame:
    keyed = df.select(
        F.col(id_col),
        F.col(name_col).alias("__name"),
        block_expr.alias("__blk"),
        F.length(name_col).alias("__len"),
    )
    l, r = keyed.alias("l"), keyed.alias("r")
    return (
        l.join(
            r,
            (F.col("l.__blk") == F.col("r.__blk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            & (
                F.abs(F.col("l.__len") - F.col("r.__len")) <= F.lit(max_dist)
            ),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            # threshold form: the DP short-circuits past max_dist and
            # returns -1, which the filter drops — same result set as
            # the oracle's unthresholded levenshtein(...) <= max_dist
            F.levenshtein("l.__name", "r.__name", max_dist).alias("dist"),
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
