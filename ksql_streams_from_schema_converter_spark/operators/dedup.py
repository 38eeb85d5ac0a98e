"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Algorithms follow the published formulations: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
SEQUENCES 1997), banded LSH (Indyk & Motwani, STOC 1998; banding per
Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3), and SimHash
(Charikar, "Similarity estimation techniques from rounding algorithms",
STOC 2002; dedup application per Manku et al., WWW 2007).

Design for 100 TB (SURVEY.md §7 / BASELINE.json north-star):

- Exact dedup is a hash-groupBy on a fingerprint — one shuffle keyed by
  the md5, no full-text comparison; AQE handles fingerprint skew.
- MinHash signatures use ``min(md5(seed || shingle))`` — the lexicographic
  min of hex digests is a valid permutation-min approximation, is
  bit-identical across engines (oracle-checkable), and computes
  map-side per document with no shuffle at all.
- LSH banding turns all-pairs O(n²) into a shuffle keyed by
  (band, band_signature): only same-bucket documents are joined, which
  is the step that survives a 1000-executor scale-up. The residual
  verify (exact Jaccard) runs only on candidate pairs.
- SimHash is a per-document map-side signature (explode tokens →
  per-bit majority vote); near-dup = small Hamming distance, again
  bucketed before pairing.

Everything is built from native expressions (md5/split/explode/groupBy);
no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, ngrams_from_tokens, normalize, tokens, word_ngrams

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per exact-content group (md5 over normalized
    text). One hash-shuffle; no text comparison."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def chunk_exact_dedup(
    docs: DataFrame,
    chunk_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document (paragraph-granularity) exact dedup: C4-style
    "remove repeated spans" (Raffel et al., JMLR 2020 §2.2 dedups at
    three-sentence granularity; here the unit is a fixed
    ``chunk_tokens``-token window, the tokenizer-friendly equivalent).

    Each document is cut into non-overlapping ``chunk_tokens`` windows;
    a chunk is a duplicate iff the same token content appeared at a
    strictly earlier (doc_id, chunk_idx) anywhere in the corpus. Output:
    one row per chunk with its md5 key and ``is_dup`` — the consumer
    keeps ``NOT is_dup`` chunks and reassembles documents.

    Scale shape: chunking is a map-side explode (1 → n_chunks rows);
    the first-occurrence decision is a ``row_number`` window keyed by
    the chunk md5 — ONE scan and ONE shuffle carrying (id, idx, digest)
    triples, never the text. (A groupBy(min)+self-join produces the
    same result but scans the chunk stage twice; the window form is the
    single-pass layout that survives 100 TB.) A skewed key — one
    boilerplate chunk repeated across the corpus — lands its triples on
    one reducer; triples are 28 bytes, so even a 10⁸-dup chunk is
    ~3 GB, inside executor memory, and AQE splits further if needed.

    The chunk layout itself (tokenize → guarded sequence → explode →
    slice, non-overlapping) is :func:`..text.chunk_documents` with
    ``overlap=0`` — ONE copy of the layout spec, so a guard or stride
    fix there cannot drift from the dedup path."""
    from pyspark.sql import Window

    from .text import chunk_documents

    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=0, text_col=text_col, id_col=id_col
    ).select(
        F.col(id_col), "chunk_idx", F.md5(F.col("chunk_text")).alias("chunk_fp")
    )
    w = Window.partitionBy("chunk_fp").orderBy(id_col, "chunk_idx")
    return chunks.select(
        id_col,
        "chunk_idx",
        "chunk_fp",
        (F.row_number().over(w) > 1).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    text: Column | str, num_hashes: int = 8, ngram: int = 3
) -> list[Column]:
    """``num_hashes`` MinHash values: for seed i, min over shingles of
    ``md5(i || ':' || shingle)`` (hex string; lexicographic min)."""
    shingles = F.array_distinct(word_ngrams(text, ngram))

    def seeded(i: int):
        # NB: must be a 1-arg lambda — F.transform passes the array index
        # as a second argument to 2-arg lambdas.
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return [
        F.array_min(F.transform(shingles, seeded(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """Explode shingles once, then ``groupBy(id).agg(min(md5(i:sh)))``.

    This shape beats the per-row array expression (:func:`minhash_signature`)
    because the shingle construction is evaluated once per document
    instead of once per hash, and the mins combine map-side (partial
    aggregation) — the shuffle carries only ``num_hashes`` digests per
    document regardless of document size. Docs with no shingles
    (< ngram tokens) drop out, as in the SQL formulation."""
    shingled = (
        docs.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(ngrams_from_tokens(F.col("__toks")))).alias("sh"),
        )
    )
    return shingled.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )


def lsh_band_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """The LSH bucket-membership table ``(id, band, key)``: one row per
    (document, band), key = the band's concatenated MinHash rows.  This
    is both the join side of :func:`lsh_candidate_pairs` and the
    posting layout a persisted index stores (incremental.py)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes)
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", *[f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; documents agreeing on ALL hashes of any
    band become a candidate pair. Output: (id_a, id_b) with a < b,
    distinct. The join is keyed by (band, band_key) — no all-pairs."""
    band_rows = lsh_band_rows(docs, text_col, id_col, num_hashes, bands)
    left = band_rows.alias("l")
    right = band_rows.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (verify step for LSH candidates, or standalone)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairs with word-``ngram`` Jaccard similarity ≥ threshold.

    Implemented as shingle-explode + equi-join on the shingle (only
    documents *sharing* a shingle are paired — the sparse-similarity
    trick), then |A∩B| / (|A|+|B|-|A∩B|). Scales as a shuffle keyed by
    shingle; a hot shingle is the skew knob (AQE skew-join handles it).
    Jaccard is returned as an exact ratio of integers cast to
    decimal(9,6) so the oracle matches bit-for-bit.

    ``max_doc_freq`` is the 100 TB safety valve: a shingle present in
    ``d`` documents emits O(d²) join pairs, so one corpus-wide
    boilerplate shingle (license header, template text) makes the
    standalone self-join quadratic — AQE skew-join splits the partition
    but cannot shrink the pair count. Setting a cutoff drops shingles
    with document frequency > ``max_doc_freq`` from the universe BEFORE
    the self-join (standard MinHash/df-pruning practice: the shingle
    leaves both the intersection and the set sizes, so the result is
    exact Jaccard over the pruned shingle universe) and bounds the
    per-shingle fan-out at ``max_doc_freq²``. Near-ubiquitous shingles
    carry almost no similarity signal, so high cutoffs (e.g. 50-1000)
    change nothing on real corpora while capping the blowup."""
    shingled = (
        docs.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(ngrams_from_tokens(F.col("__toks"), ngram))).alias("sh"),
        )
    )
    if max_doc_freq is not None:
        # Partial aggregation shrinks the df side map-side; the rare-
        # shingle keep-list then equi-joins back on the same key the
        # self-join shuffles on, so AQE can reuse/coalesce the exchange.
        rare = (
            shingled.groupBy("sh")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") <= max_doc_freq)
            .select("sh")
        )
        shingled = shingled.join(rare, "sh")
    sizes = shingled.groupBy(id_col).agg(F.count("*").alias("sz"))
    l, r = shingled.alias("l"), shingled.alias("r")
    inter = (
        l.join(r, (F.col("l.sh") == F.col("r.sh")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    # threshold applied in exact integer arithmetic (inter >= t * union),
    # so the cut is engine-independent; the decimal jaccard is cosmetic.
    t_num, t_den = (threshold * 1000000).__trunc__(), 1000000
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("inter") * t_den >= union * t_num)
        .select(
            "id_a",
            "id_b",
            F.col("inter").alias("n_common"),
            union.alias("n_union"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32  # 8 hex chars of the token md5
# (no per-row simhash Column builder on purpose: 32 bit-filters over an
# embedded md5-transform recompute every token's digest ~33x — the
# higher-order-function CSE trap; use simhash_signatures, whose
# explode+groupBy shape computes each digest once)


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Explode tokens → per-bit sums → majority vote, as a single
    groupBy with ``bits`` SUM aggregates.

    This shape beats a per-row array expression: the md5 is computed
    once per token (not once per bit), the ``bits`` sums combine
    map-side (partial aggregation), and the shuffle carries ``bits``
    longs per document — the layout that survives a 100 TB corpus."""
    toked = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).select(
        F.col(id_col), F.substring(F.md5("tok"), 1, bits // 4).alias("hx")
    )
    bit_sums = []
    for j in range(bits):
        hex_pos = j // 4 + 1
        bit_in_nibble = 3 - (j % 4)
        nib = F.conv(F.substring("hx", hex_pos, 1), 16, 10).cast("bigint")
        bit = (F.floor(nib / (2**bit_in_nibble)) % 2).cast("bigint")
        bit_sums.append(F.sum(bit).alias(f"b{j}"))
    agg = toked.groupBy(id_col).agg(F.count("*").alias("n"), *bit_sums)
    out = F.lit(0).cast("bigint")
    for j in range(bits):
        out = out + F.when(
            F.col(f"b{j}") * 2 > F.col("n"), F.lit(2 ** (bits - 1 - j)).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return agg.select(F.col(id_col), out.alias("simhash"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold, bucketed by a
    random-hyperplane (SimHash-for-vectors) sketch first so the pair
    join is per-bucket, not all-pairs. Hyperplane weights are derived
    deterministically from md5 so results are reproducible."""
    from .similarity import cosine, hyperplane_sketch

    sk = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        hyperplane_sketch(F.col(vec_col), n_planes).alias("bucket"),
    )
    l, r = sk.alias("l"), sk.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cosine"))
    )


def semantic_dedup_keep(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", 2023): within each embedding-space bucket, keep one
    representative per near-duplicate group and return the KEPT id
    set.

    Rule (deterministic, greedy keep-first): a vector is DROPPED iff it
    has ANY near-duplicate (cosine ≥ ``threshold``, same hyperplane
    bucket) with a smaller id — the smallest id of every near-dup
    neighborhood survives.  Note this drops a vector even when its
    smaller near-dups were themselves dropped (the paper's per-cluster
    greedy pass has the same property); the rule is a pure EXISTS over
    the pair set, so the oracle can replicate it exactly.

    Scale: the pair discovery is :func:`embedding_near_dup_pairs` —
    bucketed by the deterministic hyperplane sketch, never all-pairs —
    and the drop set is ∝ duplicates, not corpus, so the final
    ``left_anti`` join broadcasts in the common (mostly-unique) case.
    """
    pairs = embedding_near_dup_pairs(
        emb, threshold=threshold, vec_col=vec_col, id_col=id_col, n_planes=n_planes
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return emb.select(id_col).join(drops, id_col, "left_anti")


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list via hash-min
    label propagation (the iterative-MapReduce formulation of
    Rastogi et al., "Finding connected components in MapReduce and
    MapReduce-like systems", ICDE 2013): every node starts labeled
    with itself, and each round adopts the minimum label among itself
    and its neighbors, until a fixpoint.  Output: ``(node,
    component)`` with ``component`` = the minimum node id in the
    component — the canonical representative a dedup pipeline keeps.

    Scale notes: each round is ONE shuffle (edge-label join keyed on
    node) + a min-aggregate; rounds needed = graph diameter, which for
    dedup candidate graphs is tiny (near-dup clusters are cliques or
    short chains).  ``localCheckpoint`` truncates the growing lineage
    so round N's plan does not replay rounds 1..N-1, and the
    convergence check is a metadata-cheap ``count`` of changed labels.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select("u").distinct().select("u", F.col("u").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        by_node = labels.select(F.col("u").alias("n"), F.col("label").alias("n_label"))
        neighbor_min = (
            edges.join(by_node, edges.v == by_node.n)
            .groupBy(F.col("u").alias("n"))
            .agg(F.min("n_label").alias("nbr_label"))
        )
        # One join yields BOTH the next labels and the convergence
        # signal: a label changes iff a neighbor offered a smaller one.
        joined = (
            labels.join(neighbor_min, labels.u == neighbor_min.n, "left")
            .select(
                "u",
                F.least(
                    "label", F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "chg"
                ),
            )
            .localCheckpoint()
        )
        changed = joined.where("chg").count()
        labels = joined.select("u", "label")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def duplicated_window_stats(
    docs: DataFrame,
    window_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication profile (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022 — the
    ExactSubstr pass, with the suffix array replaced by the
    shuffle-native equivalent): every SLIDING ``window_tokens``-token
    window is fingerprinted, and a window is duplicated iff the same
    token content occurs at any other (doc, position) in the corpus.
    Output: one row per document with ≥1 window — total windows,
    duplicated windows, and the duplicated fraction (the per-document
    memorization-risk signal the paper's filter thresholds on).

    Distributed shape, in one lineage: a map-side explode materializes
    (doc, pos, md5-of-window) triples — never the text; a global
    count keyed on the digest (shuffle 1, partial-agg combinable);
    the count joins back on the SAME digest key, so AQE keeps the join
    co-partitioned with the agg output; a final doc-keyed agg
    (shuffle 2) folds the verdicts. Stride-1 windows mean the exploded
    set is ~n_tokens rows per doc — at 100 TB you fingerprint at a
    coarser stride first and re-run stride-1 only on flagged docs;
    digests are 32 bytes so even a corpus-wide boilerplate window
    lands ~GBs on one reducer, and AQE skew-split handles the rest."""
    from .text import tokens

    toked = docs.select(F.col(id_col), tokens(text_col).alias("__t"))
    n_win = F.size("__t") - (window_tokens - 1)
    wins = toked.where(n_win >= 1).select(
        id_col,
        F.explode(F.sequence(F.lit(1), n_win)).alias("pos"),
        "__t",
    ).select(
        F.col(id_col),
        "pos",
        F.md5(F.array_join(F.slice("__t", F.col("pos"), window_tokens), " ")).alias(
            "wfp"
        ),
    )
    counts = wins.groupBy("wfp").agg(F.count("*").alias("occ"))
    return (
        wins.join(counts, "wfp")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("occ") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_windows"),
        )
        .select(
            id_col,
            "n_windows",
            "n_dup_windows",
            (F.col("n_dup_windows").cast("double") / F.col("n_windows")).alias(
                "dup_frac"
            ),
        )
    )


def ngram_jaccard_pairs_prefix(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """:func:`ngram_jaccard_pairs` with PREFIX FILTERING (the AllPairs/
    PPJoin candidate bound — Bayardo et al. WWW 2007, Xiao et al.
    WWW 2008): identical output, far fewer candidate pairs.

    Shingles get a global canonical order (document frequency asc,
    shingle asc — rarest first).  A pair with Jaccard ≥ t must overlap
    in ≥ ⌈t·|x|⌉ shingles, and by the prefix-filtering lemma two sets
    overlapping in ≥ α elements share one within the first
    ``|x| − α + 1`` of EACH set under any common total order — so only
    each document's prefix is indexed into the self-join.  Using the
    per-document α (asymmetric prefixes) relaxes the lemma's shared α
    to a superset of candidates: still zero false negatives, which the
    driver gate proves by output identity with the plain formulation.
    Candidates are then verified EXACTLY: one join back to the full
    (sorted-set) shingle arrays and an ``array_intersect`` in codegen.

    Scale: the plain formulation's self-join fans out on every shared
    shingle; prefix indexing cuts the indexed postings to the rare head
    of each document (for t=0.5, half the tokens +1), and because the
    canonical order puts RARE shingles first, the surviving join keys
    are precisely the low-df ones — the blowup-prone frequent shingles
    land outside prefixes.  ``max_doc_freq`` still prunes the universe
    first (both variants must share it: the pruned universe defines
    the Jaccard).

    Honest cost accounting (r6, cold per-run timings after the cache
    lifecycle fix): at sf0.1 with the df-cutoff already bounding the
    plain join, the two variants are within ~15% of each other — the
    prefix variant pays an extra per-doc sort/agg that the candidate
    savings only repay when the corpus has hot-shingle mass the cutoff
    can't remove without changing the universe (boilerplate-heavy web
    corpora).  Its value is the ASYMPTOTIC bound: candidates are
    limited by prefix-posting overlap regardless of df skew, with zero
    false negatives — the variant you run when the cutoff is not
    acceptable.  (r5's bench showed 1.4 s vs 3.9 s, but that second
    run was warmed by this function's then-leaked cache entries.)"""
    shingled = docs.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(ngrams_from_tokens(F.col("__toks"), ngram))
        ).alias("sh"),
    )
    if max_doc_freq is not None:
        rare = (
            shingled.groupBy("sh")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") <= max_doc_freq)
            .select("sh")
        )
        shingled = shingled.join(rare, "sh")
    shingled = shingled.persist()
    df_counts = shingled.groupBy("sh").agg(F.count("*").alias("__df"))
    # ONE per-document aggregation yields both the canonical-order
    # prefix and the full verification set: collect (df, sh) structs,
    # sort (rarest-first — struct ordering is lexicographic), slice
    # the prefix, all inside codegen. The first cut used two window
    # passes (row_number + count over the doc partition) and spent
    # more in window shuffles than the candidate join saved.
    t_num, t_den = (threshold * 1000000).__trunc__(), 1000000
    docs_arr = (
        shingled.join(df_counts, "sh")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__df", "sh"))),
                lambda s: s.sh,
            ).alias("__set")
        )
        .withColumn("__sz", F.size("__set").cast("bigint"))
    )
    # alpha = ceil(t*sz) in exact integers; prefix = sz - alpha + 1
    alpha = F.expr(f"CAST(({t_num} * __sz + {t_den} - 1) div {t_den} AS BIGINT)")
    docs_arr = docs_arr.withColumn(
        "__pfx", (F.col("__sz") - alpha + 1).cast("int")
    ).persist()
    prefix = docs_arr.select(
        id_col, F.explode(F.slice("__set", F.lit(1), F.col("__pfx"))).alias("sh")
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    cand = (
        pa.join(
            pb,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sets = docs_arr.select(id_col, "__set")
    sa = sets.select(
        F.col(id_col).alias("id_a"), F.col("__set").alias("__set_a")
    )
    sb = sets.select(
        F.col(id_col).alias("id_b"), F.col("__set").alias("__set_b")
    )
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__set_a", "__set_b")).cast("long").alias(
                "n_common"
            ),
            (F.size("__set_a") + F.size("__set_b")).cast("long").alias("__szsum"),
        )
        .withColumn("n_union", F.col("__szsum") - F.col("n_common"))
    )
    from .lifecycle import eager_release

    return eager_release(
        verified.where(
            F.col("n_common") * t_den >= F.col("n_union") * t_num
        ).select("id_a", "id_b", "n_common", "n_union"),
        shingled,
        docs_arr,
    )


# ---------------------------------------------------------------------------
# exact-substring span removal (Lee et al., ACL 2022)
# ---------------------------------------------------------------------------

#: double 31-bit polynomial gram fingerprint (VERDICT r6 #8): two
#: independent Horner hashes over per-token integer hashes, combined
#: into ONE bigint key.  Primes below 2^31 keep every Horner step
#: (acc*B + h, acc < M < 2^31, B ~ 2^20) inside BIGINT with exact
#: identical truncating arithmetic on both engines.  COLLISION BUDGET
#: (ADVICE r7): ~62 effective bits means the birthday bound expects a
#: first collision near 2^31 (~3e9) distinct grams, and ~n^2/2^63
#: expected collisions beyond — at a 100-TB corpus (~1e13 grams) that
#: is ~1e7 colliding gram pairs, each able to remove ONE non-duplicate
#: k-token span: ppm-level over-removal, accepted as the trade for
#: 8-byte shuffle keys (the same posture as MinHash banding's
#: false-positive buckets).  If exactness is the contract, carry the
#: two Horner halves as separate bigint columns (~124 bits) at double
#: the key width.  Tokens are md5-hashed ONCE
#: (two 8-hex-digit heads), so bytes hashed per document are O(n),
#: not the O(n*k) of the old per-position md5 over a k-token slice —
#: and the shuffle key becomes an 8-byte long instead of a 32-char
#: string.
SPAN_M1, SPAN_B1 = 2147483647, 1000003  # 2^31 - 1 (prime)
SPAN_M2, SPAN_B2 = 2147483629, 1000033  # 2^31 - 19 (prime)
#: second independent pair for ``wide_keys`` mode (VERDICT r8 #3):
#: carrying BOTH 62-bit combined fingerprints as separate join columns
#: gives ~124 effective bits — the birthday bound moves past 2^62
#: distinct grams, i.e. exact for any physically realizable corpus —
#: at the cost of doubling the per-gram Horner work and widening the
#: shuffle key to 16 bytes.  The 62-bit single-key default remains the
#: documented ppm-over-removal contract (test_span_fingerprint_policy).
SPAN_M3, SPAN_B3 = 2147483587, 1000037  # 2^31 - 61 (prime)
SPAN_M4, SPAN_B4 = 2147483579, 1000039  # 2^31 - 69 (prime)


def _span_token_hashes(toks_col, start: int, modulus: int):
    """Per-token integer hash: 8 hex chars of md5 (chars ``start`` to
    ``start+7``) as a bigint, reduced mod ``modulus`` — one md5 per
    token, shared by every gram that covers it."""
    return F.transform(
        toks_col,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), start, 8), 16, 10).cast("bigint"),
            F.lit(modulus),
        ),
    )


def _span_horner(h_col: str, i, k: int, b: int, m: int):
    """Unrolled Horner fold over the k token hashes starting at
    0-based position ``i``: k fixed element_at steps, no array slice
    copy.  All operands nonnegative, so pmod == % on both engines."""
    acc = F.get(F.col(h_col), i)
    for j in range(1, k):
        acc = F.pmod(acc * b + F.get(F.col(h_col), i + j), F.lit(m))
    return acc


def span_gram_fingerprints(toks_col: str, k: int):
    """Array of per-position gram fingerprints for a ``__t`` token
    array column — the Spark side of the engine-portable scheme the
    oracle replays with identical integer arithmetic."""
    return F.when(
        F.size(toks_col) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - k),
            lambda i: _span_horner("__h1", i, k, SPAN_B1, SPAN_M1)
            * F.lit(2147483648)
            + _span_horner("__h2", i, k, SPAN_B2, SPAN_M2),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def span_gram_fingerprints_wide(toks_col: str, k: int):
    """``wide_keys`` variant: per-position STRUCT of the two
    independent 62-bit combined fingerprints (``g1`` from the
    M1/M2 pair over ``__h1``/``__h2``, ``g2`` from the M3/M4 pair over
    ``__h3``/``__h4``) — shuffled together they give ~124 effective
    bits, removing the birthday-bound over-removal entirely."""
    return F.when(
        F.size(toks_col) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - k),
            lambda i: F.struct(
                (
                    _span_horner("__h1", i, k, SPAN_B1, SPAN_M1)
                    * F.lit(2147483648)
                    + _span_horner("__h2", i, k, SPAN_B2, SPAN_M2)
                ).alias("g1"),
                (
                    _span_horner("__h3", i, k, SPAN_B3, SPAN_M3)
                    * F.lit(2147483648)
                    + _span_horner("__h4", i, k, SPAN_B4, SPAN_M4)
                ).alias("g2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<g1:bigint,g2:bigint>>"))


def duplicated_span_removal(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_clean_text: bool = False,
    wide_keys: bool = False,
) -> DataFrame:
    """ExactSubstr-style span dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022): any token
    span of length >= ``k`` that occurs more than once in the corpus is
    CUT OUT of every occurrence except the lexicographically-first one
    (lowest ``(doc_id, position)``), and the document's remainder is
    kept — content-level dedup, not document-level drop.

    The paper builds one giant suffix array, which is a single-node
    construction.  The distributed equivalent here exploits that "a
    duplicated span of length >= k" is exactly "a run of duplicated
    k-grams": one k-gram per token position (md5 of the k joined
    tokens — an exact key, not a sketch), a shuffle keyed by gram to
    find repeats and elect each gram's canonical first occurrence, and
    a per-document gaps-and-islands pass that merges overlapping
    duplicated positions ``[p, p+k)`` into maximal spans.  Every step
    is linear in corpus token count and equi-partitioned:

    - gram generation is map-side (``transform`` over a position
      ``sequence`` — no explode-then-window); gram keys are the
      double-31-bit polynomial fingerprint (:data:`SPAN_M1` block
      comment): each token is md5-hashed ONCE and every gram is k
      integer multiply-adds over those hashes, so bytes hashed are
      O(tokens) instead of the old O(tokens*k) per-position md5 of a
      k-token slice, and the shuffle key is an 8-byte long, not a
      32-char hex string (VERDICT r6 #8);
    - repeat detection is ONE shuffle by gram key (count + row_number
      share the same window exchange); hot grams (boilerplate) cost
      O(df) rows in one partition, not O(df^2) — there is no self-join
      anywhere;
    - span merging and text reconstruction shuffle by ``doc_id`` and
      then work per-document with native higher-order functions
      (filter/exists/get) — no Python.

    Returns one row per input document: ``(doc_id, n_spans, n_removed,
    n_kept, clean_fp)`` where ``clean_fp`` is the md5 of the surviving
    tokens joined by single spaces — a value-exact witness of the
    reconstructed text (the gate replays the whole policy)."""
    from pyspark.sql import Window

    # total over NULL text: treat it as an empty token stream on both
    # engines (unguarded, size(NULL) = -1 under legacy sizeOfNull and
    # sequence(0, -2) DESCENDS — n_kept would come out negative)
    toks = docs.select(
        F.col(id_col),
        F.coalesce(
            tokens(text_col), F.array().cast("array<string>")
        ).alias("__t"),
    )
    hashed = toks.withColumn(
        "__h1", _span_token_hashes(F.col("__t"), 1, SPAN_M1)
    ).withColumn("__h2", _span_token_hashes(F.col("__t"), 9, SPAN_M2))
    if wide_keys:
        # VERDICT r8 #3 exactness mode: two independent 62-bit
        # fingerprints shuffled as a 2-column (~124-bit) key — the
        # birthday bound vanishes; per-gram Horner work doubles
        hashed = hashed.withColumn(
            "__h3", _span_token_hashes(F.col("__t"), 17, SPAN_M3)
        ).withColumn("__h4", _span_token_hashes(F.col("__t"), 25, SPAN_M4))
        grams = hashed.select(
            F.col(id_col),
            F.posexplode(span_gram_fingerprints_wide("__t", k)).alias(
                "p", "g"
            ),
        ).select(
            F.col(id_col),
            "p",
            F.col("g.g1").alias("g1"),
            F.col("g.g2").alias("g2"),
        )
        wg = Window.partitionBy("g1", "g2")
    else:
        grams = hashed.select(
            F.col(id_col),
            F.posexplode(span_gram_fingerprints("__t", k)).alias("p", "g"),
        )
        wg = Window.partitionBy("g")
    occ = grams.select(
        F.col(id_col),
        "p",
        F.count("*").over(wg).alias("__cnt"),
        F.row_number().over(wg.orderBy(id_col, "p")).alias("__rn"),
    )
    # an occurrence is cut iff its gram repeats AND it is not the
    # gram's canonical first occurrence
    marked = occ.where((F.col("__cnt") >= 2) & (F.col("__rn") > 1)).select(
        F.col(id_col), "p", (F.col("p") + k).alias("e")
    )
    wd = Window.partitionBy(id_col).orderBy("p")
    isl = (
        marked.withColumn(
            "__prev_e",
            F.max("e").over(wd.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "__new",
            F.when(
                F.col("__prev_e").isNull() | (F.col("p") > F.col("__prev_e")), 1
            ).otherwise(0),
        )
        .withColumn("__isl", F.sum("__new").over(wd))
    )
    spans = isl.groupBy(id_col, "__isl").agg(
        F.min("p").alias("s"), F.max("e").alias("e")
    )
    doc_spans = spans.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__spans")
    )
    sp = F.coalesce(
        F.col("__spans"), F.array().cast("array<struct<s:int,e:int>>")
    )
    kept = F.filter(
        # guard the empty stream: sequence(0, -1) would DESCEND
        F.when(
            F.size("__t") > 0, F.sequence(F.lit(0), F.size("__t") - 1)
        ).otherwise(F.array().cast("array<int>")),
        lambda p: ~F.exists(sp, lambda x: (p >= x.s) & (p < x.e)),
    )
    removed = F.aggregate(sp, F.lit(0), lambda a, x: a + (x.e - x.s))
    clean_str = F.concat_ws(" ", F.transform(kept, lambda p: F.get("__t", p)))
    cols = [
        F.col(id_col),
        F.size(sp).cast("long").alias("n_spans"),
        removed.cast("long").alias("n_removed"),
        (F.size("__t") - removed).cast("long").alias("n_kept"),
        F.md5(clean_str).alias("clean_fp"),
    ]
    if emit_clean_text:
        # the reconstructed document itself, for downstream pipeline
        # stages (pretrain_pipeline_v3) — off by default so the
        # fingerprint-only gate stays narrow
        cols.append(clean_str.alias("clean_text"))
    return toks.join(doc_spans, id_col, "left").select(*cols)


# ---------------------------------------------------------------------------
# corpus-level line dedup (CCNet, Wenzek et al., LREC 2020 §3.1)
# ---------------------------------------------------------------------------


def corpus_line_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deduplicate LINES across the whole corpus (CCNet's paragraph
    dedup — the pass that removes boilerplate headers/footers shared
    by millions of pages, reference repo has no analog; per-document
    line rules live in text.c4_clean): every line keeps exactly its
    FIRST corpus-wide occurrence, ordered by (doc_id, position) — a
    deterministic total order, so the kept set is unique and the
    DuckDB oracle replays it exactly.

    Returns one row per document: ``(id, n_lines, n_dropped,
    clean_text)`` with the surviving lines re-joined in position
    order.

    Scale (VERDICT r8 #1): the hot keys here are GUARANTEED by the
    operator's purpose — blank lines and boilerplate footers shared by
    millions of pages (md5('') alone could carry 1e9 occurrences at
    100 TB).  A ``row_number`` window partitioned by the fingerprint
    would funnel every occurrence of a hot key through one task with
    no map-side combine and no AQE skew split.  Instead the first
    occurrence is computed as ``min(struct(doc_id, pos))`` grouped by
    the fingerprint: partial aggregation collapses each hot key to ONE
    partial min per map task before the exchange (the reduce side sees
    num_map_tasks rows per key, not num_occurrences), and membership
    is recovered by joining the tiny one-row-per-distinct-line table
    back to the occurrences — a shuffle hash join whose probe-side
    skew IS AQE-splittable (the build row duplicates freely).  Same
    (doc_id, pos) total order, same kept set, same oracle."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("key", F.md5(F.trim(F.lower(F.col("line")))))
    occ = F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))
    firsts = (
        lines.groupBy("key")
        .agg(F.min(occ).alias("__first"))
    )
    marked = lines.join(firsts, "key").withColumn(
        "__keep", occ == F.col("__first")
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((~F.col("__keep")).cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )


def lsh_dedup_blame(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Drop PROVENANCE for the LSH keep rule: per dropped document, the
    smallest earlier document sharing any band bucket with it — the
    audit witness a data-governance review asks for ("why was this doc
    removed, and against what").  ``(doc_id, blame_id)``, one row per
    dropped doc.

    Scale: the same bucket self-join as the dedup itself (never
    all-pairs), then a partial-aggregating ``min`` per dropped doc —
    the corpus-line-dedup extremum discipline; a doc duplicated a
    million times costs one partial min per map task, not a window
    sort."""
    rows = lsh_band_rows(docs, text_col, id_col, num_hashes, bands)
    a, b = rows.alias("a"), rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"b.{id_col}").alias(id_col))
        .agg(F.min(F.col(f"a.{id_col}")).alias("blame_id"))
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash near-duplicate PAIRS via Hamming banding (Charikar,
    STOC 2002; the Google near-dup crawl posture of Manku et al., WWW
    2007) — the pair-discovery stage the :func:`simhash_signatures`
    map-side signature exists for, and the text twin of the multimodal
    dHash banding (multimodal/binary.near_dup_pairs): split the
    ``bits``-bit signature into ``bands`` equal integer bands; any two
    signatures within Hamming ``<= bands - 1`` agree on at least one
    whole band (pigeonhole), so exact-match (band, value) buckets are
    an EXHAUSTIVE candidate set — never all-pairs — and the native
    ``bit_count(a ^ b)`` verify keeps exactly the true pairs.
    ``max_hamming > bands - 1`` would silently miss pairs and raises
    instead (the ADVICE r9 banding guard).

    Output: ``(id_a, id_b, hamming)``, id_a < id_b.

    Scale: one signature pass (partial-aggregated bit sums), one
    shuffle keyed by the (band, value) bucket — random 8-bit band
    values collide at ~N²/2⁸ per band, the documented LSH candidate
    budget; bucket skew (boilerplate-dominated corpora collapse to few
    signatures) is AQE-splittable."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding with {bands} bands is only exhaustive for "
            f"max_hamming <= {bands - 1} (pigeonhole); got {max_hamming}"
        )
    if bits % bands != 0:
        # a ValueError like the max_hamming guard above, NOT an assert:
        # under `python -O` an assert vanishes and a non-dividing bands
        # value would silently truncate the band width, leaving the top
        # bits unbucketed — the pigeonhole exhaustiveness guarantee
        # would be lost without any signal (ADVICE r10)
        raise ValueError(
            f"bits ({bits}) must divide evenly into {bands} bands"
        )
    width = bits // bands
    sig = simhash_signatures(docs, text_col, id_col, bits)
    bandrows = sig.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(
                            f"CAST((simhash div {1 << (j * width)}) "
                            f"% {1 << width} AS BIGINT)"
                        ).alias("v"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.j", "b.v")
    l, r = bandrows.alias("l"), bandrows.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.j") == F.col("r.j"))
            & (F.col("l.v") == F.col("r.v"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr("CAST(bit_count(sa ^ sb) AS BIGINT)")
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
