"""Skew-mitigation helpers: salted two-phase aggregation.

At 100 TB a handful of hot keys (one merchant, one event type, one
null-ish RECID) can pin a single reducer. AQE's skew-join splitting
covers joins; for *aggregations* the classic fix is salting: shuffle on
(key, salt) first so the hot key spreads over ``n_salts`` reducers,
then combine the partials with a second (tiny) shuffle on the key.

Only algebraic aggregates compose this way — count/sum/min/max (and
avg as sum+count). For those, Spark's own partial aggregation usually
suffices; salting matters when the *map-side* partials are already
huge per key (high-cardinality state per group, e.g. collect-style
aggs) or when a downstream stage inherits the skewed partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with a random salt.

    ``aggs`` maps output name -> (combine_fn_name, phase1_column) where
    combine_fn_name in {'sum', 'min', 'max'} re-aggregates the partials
    (count partials combine with 'sum').

    Example::

        salted_agg(ev, ["event_type"],
                   {"n": ("sum", F.count("*")),
                    "total": ("sum", F.sum(F.col("value").cast("decimal(18,2)")))})
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, (_, c) in aggs.items()]
    )
    combine = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return phase1.groupBy(*keys).agg(
        *[combine[fn](f"__p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join by salting: the big (skewed) side gets a
    deterministic salt ``pmod(hash(entire row key + a row fingerprint),
    n)`` — here derived from the key AND a per-row hash so a single hot
    key's rows spread over ``n_salts`` reducers — and the small side is
    replicated ``n_salts`` times (explode over the salt domain), so the
    join key becomes (key, salt) and no reducer owns a hot key alone.

    Output is row-identical to the plain join (the salt is internal);
    cost is ``n_salts×`` the small side's shuffle bytes — the classic
    trade when AQE's skew splitting can't help (e.g. the skewed side
    feeds a co-partitioned downstream stage, or the join is inside a
    streaming micro-batch where AQE is off). AQE remains the first
    resort; this is the explicit fallback."""
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.hash(F.col(big_key), F.monotonically_increasing_id()), n_salts),
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return joined.drop(salted_big["__salt"]).drop(salted_small["__salt"])
