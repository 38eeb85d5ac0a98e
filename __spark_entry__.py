"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``ksql_streams_from_schema_converter_spark.workload``
(one registry powers this contract, the tests, and bench.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from ksql_streams_from_schema_converter_spark.canon import (
    canonicalize_oracle_sql,
    canonicalize_spark_output,
)
from ksql_streams_from_schema_converter_spark.workload import WORKLOAD


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full T24 ETL pipeline (RAW → MAPPED → MULTIVALUE →
    SINK) with VM/VS explosion, over sf0.001. Driver checks rows>0."""
    fn, _ = WORKLOAD["t24_multivalue_explode"]
    return fn(spark, "/root/testdata/sf0.001")


def _canon(fn: Callable[[SparkSession, str], DataFrame]):
    """Driver-boundary canonicalization (canon.py): DECIMAL/DATE result
    columns become strings so both engines hash identically. Applied
    here — not in the queries — so the engine keeps exact decimal
    arithmetic and bench.py times the un-retyped plans."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return canonicalize_spark_output(fn(spark, sf_dir))

    return wrapped


#: The driver checks only the FIRST 50 entries of ``queries()`` in dict
#: order (verified rounds 1-4).  After r04, union coverage is 141/141
#: ever-checked, so from round 5 on the window is COMPUTED, not
#: hand-listed (VERDICT r4 #2/#8): new-or-changed queries first (they
#: need fresh rows), then every other query sorted staleness-first by
#: its newest driver row across all CORRECTNESS_r*.json records
#: (never-checked sorts first).  r5 instance: the PRIORITY_THIS_ROUND
#: queries below (new operators, the 3 ANN queries whose shape changed
#: to recall verdicts, the upsert rewritten onto the bucketed MERGE)
#: fill the leading slots; the rest go to the stalest of the 44
#: queries whose newest row is r01/r02, with the leftovers leading
#: r6's window automatically.  Guarded by tests/test_driver_window.py.

#: queries added or materially changed this round — they take window
#: slots ahead of the staleness rotation.  r6: the two NEW operators
#: (distributed BPE training, incremental dedup against a persisted
#: LSH index), plus the queries whose code changed this round —
#: table_checksum (sum moved into decimal), cogroup (sign-correct
#: formatting), merge/upsert (commit-marker version resolution).
#: Everything else rotates by staleness: the 35 queries whose newest
#: driver row is r02 fill the remaining 44 slots first (VERDICT r5
#: #2 — after r6, no query's newest driver row should be older
#: than r3).
#: r12: the 5 NEW queries (the clusterer-persistence lifecycle gate,
#: streaming SemDeDup against the frozen persisted model, the
#: multimodal incremental near-dup gate, and the two learned
#: language-ID gates), plus every query whose code path changed this
#: round — the whole k-means family (kmeans_embeddings_exact,
#: semdedup_kmeans, semdedup_two_level, pretrain_pipeline_v6/_v7:
#: the dist*keymul+cluster modulus argmin was replaced by the
#: min(struct(dist, cluster)) election, VERDICT r11 weak #1), the two
#: multimodal index gates (refresh gained the committed_max_id
#: monotone guard; id_col plumbed through signing), and
#: bigram_backoff_surprisal (the ref_docs path now counts through
#: bigram_lm_counts).  The remaining ~37 slots rotate staleness-first:
#: all 12 queries whose newest driver row is r6, then the r7 cohort.
#: r13: the 3 NEW queries (two-level warm-start retrain, the v8
#: funnel behind the LEARNED language gate, char-n-gram langid
#: training), plus every query whose code path changed this round —
#: the k-means persistence family (load_kmeans_model returns the
#: manifest-known two_level flag; assign_frozen/semdedup_frozen/
#: semdedup_batch_verdicts take it driver-side, ADVICE r12), the
#: two-level chain oracles (MATERIALIZED CTEs for the spliced warm
#: oracle), the v6/v7 funnel refactor (_pretrain_funnel /
#: _v6_funnel_sql extraction), the langid train/apply ``features``
#: parameter, and the multimodal refresh guard reorder.  The
#: remaining ~37 slots rotate staleness-first: all 19 r7 rows, then
#: the oldest r8 cohort (VERDICT r12 #6).
#: r13 is the first OPTIMIZATION round: the 3 NEW queries from the
#: inherited partial build keep the leading slots, then every query
#: whose execution path the r13 optimizations touched — the tokenizer
#: family (driver-side merge rounds, encode memoization, store IO),
#: the langid family (fused training rounds, store IO), the two-level
#: k-means family (driver-side coarse Lloyd), the funnel pipelines
#: composing them, and the streaming gates (single-write fixtures,
#: driver-side artifact loads).  Results are oracle-identical by
#: construction (verified at sf0.001+sf0.01 per change), but changed
#: paths take window slots ahead of staleness per the standing rule.
PRIORITY_THIS_ROUND: tuple[str, ...] = (
    "kmeans_two_level_warm_refresh",
    "pretrain_pipeline_v8",
    "langid_char_ngram_train",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "bpe_tokenizer_lifecycle",
    "wordpiece_train_merges",
    "wordpiece_encode_greedy",
    "wordpiece_tokenizer_lifecycle",
    "unigram_encode_tokens",
    "unigram_tokenizer_lifecycle",
    "langid_classifier_train",
    "langid_classifier_apply",
    "streaming_langid_gate",
    "kmeans_lifecycle",
    "kmeans_warm_refresh",
    "semdedup_two_level",
    "streaming_semdedup",
    "pretrain_pipeline_v6",
    "pretrain_pipeline_v7",
    "streaming_quality_gate",
    "streaming_pretrain_v6",
    "streaming_ann_refresh",
    "streaming_ann_retraction",
    "streaming_index_retraction",
    "streaming_incremental_dedup",
    "streaming_multimodal_retraction",
)

_WINDOW_SIZE = 50


def latest_driver_round() -> dict[str, int]:
    """Per query, the newest round with a driver correctness row —
    parsed from the CORRECTNESS_r*.json records next to this file.
    Queries never checked are absent (treated as round 0)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def compute_window(size: int = _WINDOW_SIZE) -> tuple[str, ...]:
    """This round's driver window: priority (new/changed) queries, then
    staleness-first — ascending newest-driver-round, ties by name."""
    latest = latest_driver_round()
    priority = [n for n in PRIORITY_THIS_ROUND if n in WORKLOAD]
    rest = sorted(
        (n for n in WORKLOAD if n not in priority),
        key=lambda n: (latest.get(n, 0), n),
    )
    return tuple([*priority, *rest][:size])


DRIVER_WINDOW = compute_window()


def _rotated() -> list[str]:
    """All workload names, DRIVER_WINDOW first, rest in registration
    order — the dict order the driver iterates."""
    rest = [n for n in WORKLOAD if n not in DRIVER_WINDOW]
    return [*DRIVER_WINDOW, *rest]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    north-star extension operators)."""
    return {name: _canon(WORKLOAD[name][0]) for name in _rotated()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet views. Entries without SQL-expressible semantics are omitted
    (driver records a rows-only check for those)."""
    return {
        name: canonicalize_oracle_sql(WORKLOAD[name][1])
        for name in _rotated()
        if WORKLOAD[name][1] is not None
    }
