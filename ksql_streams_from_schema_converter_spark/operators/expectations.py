"""Declarative data-quality expectations over a DataFrame — the
dbt-test / Great-Expectations-shaped validation stage a production
pipeline runs before publishing a table.

Design for 100 TB: all row-level rules (not-null, range, accepted
values, regex) compile into ONE aggregate pass over the input —
``count_if`` per rule, map-side combined, zero extra scans per rule.
Key-uniqueness needs a shuffle by the key (it is a distributed
property, not a row property) and runs as a second single job. Results
come back as one tiny (rule, n_violations) frame — the shape that
feeds an alerting sink or a circuit-breaker on the write path.

For streaming, the same row-level expressions can piggyback on
``df.observe`` so violation counters ride the existing micro-batch
pass with zero extra work.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named violation predicate: rows where ``violated`` is true
    count against the rule."""

    name: str
    violated: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(f"range({col},{lo},{hi})", c.isNull() | (c < lo) | (c > hi))


def accepted_values(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(f"accepted_values({col})", c.isNull() | ~c.isin(*values))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches({col})", c.isNull() | ~c.rlike(pattern))


def observe_rules(df: DataFrame, rules: list[Rule], name: str = "quality"):
    """Piggyback row-level violation counters on an EXISTING pass:
    ``df.observe`` attaches the ``count_if`` aggregates to whatever
    action the caller runs next (a write, a count), so validation costs
    ZERO extra scans — the right shape when the table is being
    published anyway, and the same mechanism streams per-micro-batch
    via ``QueryListener``. Returns ``(observed_df, observation)``;
    read ``observation.get`` AFTER an action on the observed frame."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs, *[F.count_if(r.violated).cast("bigint").alias(r.name) for r in rules]
    )
    return observed, obs


def check(
    df: DataFrame, rules: list[Rule], unique_keys: list[list[str]] | None = None
) -> DataFrame:
    """Evaluate all expectations. Returns (rule, n_violations) with one
    row per rule, ordered by rule name.

    Row-level rules are ONE aggregate over the input; each ``unique``
    check counts rows belonging to a duplicated key group (groupBy the
    key, keep groups with count > 1, sum their sizes) — the exact
    violation count a dedup step would have to fix."""
    aggs = [
        F.count_if(r.violated).cast("bigint").alias(r.name) for r in rules
    ]
    row_level = df.agg(*aggs) if aggs else None
    parts = []
    if row_level is not None:
        parts.append(
            row_level.unpivot([], [r.name for r in rules], "rule", "n_violations")
        )
    for keys in unique_keys or []:
        label = f"unique({','.join(keys)})"
        dup_rows = (
            df.groupBy(*[F.col(k) for k in keys])
            .agg(F.count("*").alias("__n"))
            .where(F.col("__n") > 1)
            .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_violations"))
            .select(F.lit(label).alias("rule"), "n_violations")
        )
        parts.append(dup_rows)
    if not parts:
        # no rules and no keys (e.g. empty per-table config): a valid,
        # empty report — not a crash
        return df.sparkSession.createDataFrame(
            [], "rule string, n_violations bigint"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")
