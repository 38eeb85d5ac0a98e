"""Distributed Bloom-filter semi-join pruning — the explicit form of
the runtime row-level filtering a 100 TB join wants: build a tiny bit
sketch of the (filtered) build side's keys, ship it to the probe side,
and drop non-matching fact rows AT THE SCAN, before the join shuffle.

All-native construction (no UDFs, no Python in the hot path):

- build: each key sets ``k`` bits ``pmod(hash(key, seed_i), m)`` —
  Murmur3 via ``F.hash(col, lit(seed))``, deterministic across runs.
  One explode → one ``bit_or`` aggregation keyed by 64-bit word index
  (map-side combining; the shuffle carries ≤ m/64 rows per partition).
- the finished sketch is ``m/64`` longs — KBs — collected once and
  embedded as an array literal in the probe-side filter (exactly how
  Spark's InSubqueryExec/bloom runtime filters broadcast), so the
  membership test runs inside whole-stage codegen.
- probe: ``might_contain`` = AND over the k bit tests
  (``element_at(words, word_idx)`` + shift/mask).

Guarantee: NO false negatives (every inserted key passes), so a
bloom-pruned join returns EXACTLY the plain join's rows — false
positives only waste a little shuffle. That identity is the driver
hash gate (`bloom_pruned_join_orders`); the false-positive rate is
`(1 - e^{-kn/m})^k`, sized by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.hash(col, F.lit(1000 + seed)), F.lit(m_bits))
        for seed in range(k)
    ]


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 8192, k: int = 4) -> list[int]:
    """Build the filter over ``df[key_col]``: returns ``m_bits/64``
    longs (the driver-side sketch — KBs, the documented tiny collect of
    a runtime filter). ``m_bits`` must be a multiple of 64."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    words = (
        df.select(pos)
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    sketch = [0] * n_words
    for r in words:
        sketch[r.w] = r.bits
    return sketch


def might_contain(sketch: list[int], col: Column, k: int = 4) -> Column:
    """Codegen membership test against a built sketch: AND over the k
    bit probes. The sketch rides in the plan as an array literal."""
    m_bits = len(sketch) * 64
    words = F.array(*[F.lit(w).cast("long") for w in sketch])
    cond = F.lit(True)
    for p in _positions(col, m_bits, k):
        word = F.element_at(words, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = cond & (bit == 1)
    return cond


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 8192,
    k: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Join with the fact side pre-pruned by a Bloom filter of the dim
    keys. Output is IDENTICAL to the un-pruned join (no false
    negatives); at scale the pruning filter sits on the fact scan and
    kills most of the join shuffle before it exists."""
    sketch = bloom_build(dim, dim_key, m_bits, k)
    pruned = fact.where(might_contain(sketch, F.col(fact_key), k))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
