"""Semantic checks for the training-data-pipeline operators: not just
oracle parity, but 'does dedup actually find the planted duplicates'."""

import os

import pytest
from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators import dedup as D
from ksql_streams_from_schema_converter_spark.operators import similarity as S
from ksql_streams_from_schema_converter_spark.workload import dedup_corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return dedup_corpus(spark, SF_DIR).cache()


def test_exact_dedup_finds_planted_duplicates(corpus):
    groups = D.dedup_exact(corpus)
    dups = groups.where(F.col("n_dups") > 1)
    # 25 planted exact copies → 25 groups of exactly 2
    assert dups.count() == 25
    assert dups.agg(F.max("n_dups")).head()[0] == 2
    # keeper is always the original (lower id)
    assert dups.agg(F.max("keep_id")).head()[0] < 10000


def test_lsh_finds_planted_near_duplicates(corpus):
    pairs = D.lsh_candidate_pairs(corpus).collect()
    pair_set = {(r.id_a, r.id_b) for r in pairs}
    # exact copies share every band → always paired
    exact_pairs = {(i, i + 20000) for i in range(25)}
    assert exact_pairs <= pair_set
    # near-dups (one token dropped) should mostly be caught
    near_hits = sum((i, i + 10000) in pair_set for i in range(25))
    assert near_hits >= 20, f"LSH caught only {near_hits}/25 near-dups"


def test_jaccard_scores_planted_pairs_high(corpus):
    pairs = D.ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    near = {(r.id_a, r.id_b): (r.n_common, r.n_union) for r in pairs}
    assert all((i, i + 20000) in near for i in range(25))  # exact → jaccard 1
    for i in range(25):
        if (i, i + 10000) in near:
            c, u = near[(i, i + 10000)]
            assert c * 2 >= u  # passed the 0.5 threshold by construction


def test_jaccard_df_cutoff_bounds_hot_shingle_blowup(spark):
    """A corpus-wide boilerplate shingle must not make the standalone
    shingle self-join quadratic: with max_doc_freq set, ubiquitous
    shingles leave the universe before pairing, so only genuinely
    similar documents pair (the 100 TB scale valve, VERDICT r2 item 3)."""
    boiler = "all rights reserved license header "
    rows = [(i, boiler + f"unique filler text {i} alpha {i} beta {i} gamma {i}")
            for i in range(30)]
    # three genuine near-dup pairs sharing a long per-cluster-unique tail
    # (every tail word carries j so no trigram crosses clusters)
    for j in range(3):
        tail = f"alpha{j} bravo{j} charlie{j} delta{j} echo{j} " * 3
        rows.append((100 + j, boiler + tail + f"extraone{j} extratwo{j}"))
        rows.append((200 + j, boiler + tail + f"otherone{j} othertwo{j}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    # df cutoff 10 < 36 docs: boilerplate shingles dropped everywhere.
    # threshold near zero so ANY surviving shared shingle creates a pair
    # — the output size IS the generated-pair count.
    bounded = D.ngram_jaccard_pairs(docs, threshold=0.01, max_doc_freq=10).collect()
    got = {(r.id_a, r.id_b) for r in bounded}
    assert got == {(100 + j, 200 + j) for j in range(3)}, got

    # without the cutoff the boilerplate pairs every document with every
    # other — the O(df²) blowup the cutoff exists to prevent
    unbounded = D.ngram_jaccard_pairs(docs, threshold=0.01).count()
    assert unbounded == 36 * 35 // 2

    # and the cutoff leaves true Jaccard pairs intact at a real threshold
    strict = {(r.id_a, r.id_b)
              for r in D.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=10).collect()}
    assert strict == {(100 + j, 200 + j) for j in range(3)}


def _planted_knn_corpus(spark, qids, copies=5):
    """Shared planted-truth corpus (see ``S.planted_corpus``): the exact
    top-``copies`` of every query is the planted set — real ground
    truth for recall gates, not a vacuous overlap bound."""
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = S.planted_corpus(emb, qids, copies=copies)
    truth = {
        (qid, qid + S.PLANTED_OFFSET * (j + 1)) for qid in qids for j in range(copies)
    }
    return corpus.cache(), truth


def test_knn_bruteforce_finds_planted_ground_truth(spark):
    qids = list(range(5))
    corpus, truth = _planted_knn_corpus(spark, qids)
    exact = {(r.query_id, r.neighbor_id) for r in S.knn_bruteforce(corpus, qids, k=5).collect()}
    assert exact == truth  # planted near-dups ARE the exact top-5


def test_knn_lsh_recall_against_planted_truth(spark):
    qids = list(range(5))
    corpus, truth = _planted_knn_corpus(spark, qids)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_lsh(corpus, qids, k=5, n_planes=4).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.8, f"LSH missed planted near-identical vectors: recall={recall}"


def test_knn_ivf_recall_against_planted_truth(spark):
    qids = list(range(5))
    corpus, truth = _planted_knn_corpus(spark, qids)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_ivf(corpus, qids, k=5, n_cells=8, nprobe=3).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.8, f"IVF missed planted near-identical vectors: recall={recall}"
    # every query must produce a full top-k (probed cells are never empty:
    # the query's own cell is always among its probes)
    assert len(approx) == len(truth)


def test_knn_ivf_pq_recall_against_planted_truth(spark):
    """PQ-compressed scoring (8-byte codes) must still rank the planted
    near-identical vectors on top: the reconstruction error (±0.01
    perturbations vs codebook cells trained on the corpus) is far
    smaller than the planted/random cosine gap."""
    qids = list(range(5))
    corpus, truth = _planted_knn_corpus(spark, qids)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_ivf_pq(corpus, qids, k=5, n_cells=8, nprobe=3, m=8, ksub=16).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.8, f"IVF-PQ missed planted near-identical vectors: recall={recall}"


def test_pq_encode_roundtrip_error_bounded(spark):
    """PQ reconstruction quality and determinism. The fixture embeddings
    are near-random 64-dim vectors — PQ's worst case (no cluster
    structure to exploit), so the defensible bounds are positive-but-
    lossy: every reconstruction must keep cosine ≥ 0.4 with its source
    and ≥ 0.6 on average (random chance is ~0). The planted-cluster
    recall gate above is where ranking fidelity is asserted; here we
    pin codes validity and exact reproducibility across partitionings
    (the property the driver's hash would see)."""
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    books = S.train_pq_codebooks(emb, m=8, ksub=16, vec_col="v", id_col="vec_id")
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    enc = S.pq_encode(emb, books)
    stats = enc.select(S.cosine(F.col("v"), F.col("recon")).alias("c")).agg(
        F.min("c").alias("worst"), F.avg("c").alias("mean")
    ).head()
    assert stats.worst >= 0.4, f"PQ reconstruction cosine too low: {stats.worst}"
    assert stats.mean >= 0.6, f"PQ mean reconstruction cosine too low: {stats.mean}"
    # codes are valid indices
    rng = enc.select(
        F.array_min("code").alias("lo"), F.array_max("code").alias("hi")
    ).agg(F.min("lo"), F.max("hi")).head()
    assert rng[0] >= 0 and rng[1] < 16
    # training and encoding are partitioning-independent (deterministic
    # sample + rounded distance argmins)
    books2 = S.train_pq_codebooks(
        emb.repartition(7), m=8, ksub=16, vec_col="v", id_col="vec_id"
    )
    assert books == books2
    codes1 = {r.vec_id: list(r.code) for r in enc.select("vec_id", "code").collect()}
    codes2 = {
        r.vec_id: list(r.code)
        for r in S.pq_encode(emb.repartition(7), books).select("vec_id", "code").collect()
    }
    assert codes1 == codes2


def test_ivf_centroids_deterministic(spark):
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    c1 = S.train_ivf_centroids(emb, n_cells=4, refine_iters=1)
    c2 = S.train_ivf_centroids(emb.repartition(7), n_cells=4, refine_iters=1)
    assert c1 == c2  # reproducible across partitionings


def test_chunk_dedup_flags_planted_copies_and_keeps_originals(corpus):
    """Every chunk of a planted exact-copy document must flag as a dup
    of the original's chunk; the originals' chunks stay kept (except
    content shared between originals themselves)."""
    # NB: not .cache()d — a cached identical plan would be substituted
    # (InMemoryRelation) into test_plans_and_sinks' plan-shape assert
    # for the same query, changing its exchange count
    flags = D.chunk_exact_dedup(corpus, chunk_tokens=16)
    copies = flags.where(F.col("doc_id") >= 20000)
    assert copies.count() > 0
    assert copies.where(~F.col("is_dup")).count() == 0, (
        "a chunk of an exact copy was not flagged as duplicate"
    )
    # first occurrences are never flagged: exactly one kept row per fp
    per_fp = flags.groupBy("chunk_fp").agg(
        F.sum(F.when(~F.col("is_dup"), 1).otherwise(0)).alias("kept")
    )
    assert per_fp.where(F.col("kept") != 1).count() == 0


def test_chunk_dedup_short_and_empty_docs(spark):
    """Docs shorter than one chunk yield a single (partial) chunk; a
    0-token doc yields no rows (the sequence(0,-1) guard)."""
    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "only three tokens")],
        ["doc_id", "text"],
    )
    rows = D.chunk_exact_dedup(docs, chunk_tokens=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 3}  # "" tokenizes to [''] → one chunk
    assert len(by_doc[1]) == 1 and not by_doc[1][0].is_dup
    assert len(by_doc[3]) == 1 and by_doc[3][0].is_dup


def test_gopher_flags_exact_rules(spark):
    """Hand-built docs exercising each rule boundary."""
    from ksql_streams_from_schema_converter_spark.operators.text import (
        gopher_quality_flags,
    )

    # 41 toks, word-chars 202 → mean 4.93 ∈ [4,5]; 2 stopword hits
    good = " ".join(["words"] * 39 + ["that", "was"])
    too_short = "tiny doc the of"
    no_stop = " ".join(["word"] * 40)
    symbols = " ".join(["word"] * 30 + ["###!!!", "%%%", "&&&", "the", "of"])
    docs = spark.createDataFrame(
        [(1, good), (2, too_short), (3, no_stop), (4, symbols)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    assert out[1].keep
    assert not out[2].ok_word_count and not out[2].keep
    assert not out[3].ok_stopwords and not out[3].keep
    assert not out[4].ok_symbol_ratio and not out[4].keep
    # mean-word-len rule: 'word' is 4 chars → ok; all-1-char tokens fail
    ones = spark.createDataFrame(
        [(5, " ".join(["a"] * 35 + ["the", "of"]))], ["doc_id", "text"]
    )
    r5 = gopher_quality_flags(ones).collect()[0]
    assert not r5.ok_mean_word_len and not r5.keep


def test_simhash_near_dups_have_small_hamming(spark, corpus):
    sig = D.simhash_signatures(corpus)
    a = sig.alias("a")
    b = sig.alias("b")
    joined = (
        a.join(b, F.col("a.doc_id") + 10000 == F.col("b.doc_id"))
        .select(
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming")
        )
    )
    rows = joined.collect()
    assert rows, "no near-dup pairs joined"
    avg = sum(r.hamming for r in rows) / len(rows)
    assert avg <= 8, f"near-dup average hamming too high: {avg}"


def test_multimodal_feature_extraction(spark):
    from ksql_streams_from_schema_converter_spark.multimodal import (
        attach_fake_media,
        extract_media_features,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    feats = extract_media_features(attach_fake_media(docs))
    row = feats.orderBy("doc_id").head()
    assert row.n_bytes > 0 and len(row.checksum) == 32
    assert row.feat_mean > 0  # deterministic fake decode
    assert feats.count() == docs.count()


def test_multimodal_resize_payload_bytes(spark):
    from ksql_streams_from_schema_converter_spark.multimodal import (
        attach_fake_media,
        resize_media,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = {r.doc_id: r for r in attach_fake_media(docs).collect()}
    for r in resize_media(attach_fake_media(docs), target_width=64).collect():
        src = media[r.doc_id]
        stride = max(1, src.meta_width // 64)
        assert bytes(r.payload) == bytes(src.payload)[::stride]
        assert r.n_bytes == len(r.payload)
        assert r.meta_width == -(-src.meta_width // stride)
        assert r.meta_height == -(-src.meta_height // stride)


def test_multimodal_near_dup_planted_payloads(spark):
    """VERDICT r8 #4: perceptual dHash + Hamming-banded pairing finds
    planted exact and near-identical payloads; the candidate plan is
    BUCKETED (join keyed on (band, value)), never a cartesian
    all-pairs."""
    import contextlib
    import io

    from ksql_streams_from_schema_converter_spark.multimodal import (
        near_dup_pairs,
        perceptual_dhash,
    )
    from ksql_streams_from_schema_converter_spark.multimodal.binary import (
        _fake_pixels,
    )

    base = bytes(range(40, 200, 2))  # 80 distinct bytes, rich gradient
    near = bytearray(base)
    near[40] = 255  # one "pixel" byte flipped -> <=2 dHash bits
    far = bytes(reversed(base))  # gradient inverted -> far in dHash space
    media = spark.createDataFrame(
        [
            (1, "image/fake", base, 80, 60),
            (2, "image/fake", bytes(near), 80, 60),
            (3, "image/fake", base, 80, 60),  # exact copy of 1
            (4, "image/fake", far, 80, 60),
        ],
        "doc_id long, media_type string, payload binary, meta_width int, meta_height int",
    )
    hashes = perceptual_dhash(media)
    pairs = near_dup_pairs(hashes, max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 3)] == 0  # exact copy
    assert (1, 2) in got and 0 < got[(1, 2)] <= 2  # the planted near-dup
    assert (2, 3) in got
    assert not any(4 in p for p in got)  # inverted gradient is far
    # sanity: the near payload really flipped at least one dHash bit
    assert _fake_pixels(base) != _fake_pixels(bytes(near))
    # bucketed-plan guard: candidate generation is an equi-join on the
    # (band, value) bucket — no cartesian/broadcast-nested-loop pairing
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_frame_near_dup_alignment(spark):
    """Frame-level near-dup: an exact re-encode matches on all frames,
    a one-frame edit on all-but-one (still above threshold), disjoint
    content on none — and candidates only ever pair ALIGNED frames
    (the (frame_idx, band, value) bucket key), bucketed plan, no
    cartesian."""
    import contextlib
    import io

    from ksql_streams_from_schema_converter_spark.multimodal import (
        frame_dhash,
        frame_near_dup_pairs,
    )

    base = bytes(range(0, 240))  # 240 bytes -> 8 frames of 30
    edited = bytearray(base)
    edited[100] = 255  # inside frame 3 only
    far = bytes(reversed(base))
    media = spark.createDataFrame(
        [
            (1, "video/fake", base, 240, 1),
            (2, "video/fake", bytes(edited), 240, 1),
            (3, "video/fake", base, 240, 1),
            (4, "video/fake", far, 240, 1),
        ],
        "doc_id long, media_type string, payload binary, meta_width int, meta_height int",
    )
    fh = frame_dhash(media, n_frames=8)
    assert fh.count() == 32  # 4 docs x 8 non-empty frames
    pairs = frame_near_dup_pairs(fh, max_hamming=3, min_frames=4)
    got = {(r.id_a, r.id_b): r.n_close_frames for r in pairs.collect()}
    assert got[(1, 3)] == 8  # exact re-encode: every frame aligned-close
    assert got[(1, 2)] >= 7  # one edited frame can at most drop one
    assert not any(4 in p for p in got)  # reversed content: no pair
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_frame_sample_reassembles(spark):
    import hashlib

    from ksql_streams_from_schema_converter_spark.multimodal import (
        attach_fake_media,
        sample_frames,
    )
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = {r.doc_id: bytes(r.payload) for r in attach_fake_media(docs).collect()}
    frames = sample_frames(attach_fake_media(docs), n_frames=8).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(media)
    for doc_id, rows in by_doc.items():
        data, n = media[doc_id], len(media[doc_id])
        total = sum(r.frame_bytes for r in rows)
        assert total == n  # frames tile the payload exactly
        for r in rows:
            chunk = data[r.frame_idx * n // 8 : (r.frame_idx + 1) * n // 8]
            assert r.frame_checksum == hashlib.md5(chunk).hexdigest()


def test_semantic_dedup_keeps_smallest_id_per_neighborhood(spark):
    """SemDeDup greedy rule on a controlled geometry: ids 1 and 2 are
    the same direction (near-dups → 2 dropped), id 3 is orthogonal
    (kept), id 4 duplicates 3 (dropped). Scaled copies share hyperplane
    signs, so bucketed recall is exact for them."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),   # ×2 copy of 1 → dropped
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 3.0, 0.0, 0.0]),   # ×3 copy of 3 → dropped
        (5, [0.0, 0.0, 1.0, 0.0]),   # unique → kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sorted(
        r.vec_id
        for r in D.semantic_dedup_keep(emb, threshold=0.95).collect()
    )
    assert kept == [1, 3, 5]


def test_levenshtein_pairs_blocking_contract(spark):
    """The fuzzy matcher's documented contract: pairs within max_dist
    are found iff they agree on the blocked prefix and length band —
    an edit INSIDE the prefix is invisible to this pass (callers union
    a second pass on another block key for that)."""
    from ksql_streams_from_schema_converter_spark.operators.fuzzy import (
        levenshtein_pairs,
    )

    rows = [
        (1, "widget blue"),
        (2, "widget blu"),     # last-char drop: dist 1, same prefix -> found
        (3, "midget blue"),    # edit at char 1: dist 1 but prefix differs -> missed
        (4, "widget bluesteel extra"),  # same prefix, length diff 11 -> band-pruned
        (5, "gadget gold"),    # unrelated
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in levenshtein_pairs(df, max_dist=2, prefix_len=4).collect()
    }
    assert got == {(1, 2, 1)}


def test_levenshtein_multipass_catches_prefix_edits(spark):
    """The documented escalation: the suffix pass recovers pairs whose
    edit falls INSIDE the blocked prefix (exact recall for one edit on
    strings longer than 2*prefix_len), while staying blocked — no
    all-pairs join in the plan."""
    from ksql_streams_from_schema_converter_spark.operators.fuzzy import (
        levenshtein_pairs,
        levenshtein_pairs_multipass,
    )

    rows = [
        (1, "widget blue"),
        (2, "midget blue"),   # edit at char 1: invisible to prefix pass
        (3, "widget bluu"),   # edit at the end: invisible to suffix pass
        (4, "gadget gold"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    single = {
        (r.id_a, r.id_b)
        for r in levenshtein_pairs(df, max_dist=1, prefix_len=4).collect()
    }
    multi = {
        (r.id_a, r.id_b)
        for r in levenshtein_pairs_multipass(df, max_dist=1, prefix_len=4).collect()
    }
    assert single == {(1, 3)}
    assert multi == {(1, 2), (1, 3)}
    plan = (
        levenshtein_pairs_multipass(df, max_dist=1, prefix_len=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_connected_components_chain_and_cliques(spark):
    # A 5-node chain (diameter 4: forces multiple propagation rounds),
    # a separate triangle, and an isolated edge.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    got = {
        r.node: r.component
        for r in D.connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_connected_components_respects_iteration_cap(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    got = {r.node: r.component for r in D.connected_components(pairs, max_iterations=1).collect()}
    # After exactly one round node 3 has only adopted its neighbor's id
    # (2), not yet the transitive min (1) — the cap is honored.
    assert got == {1: 1, 2: 1, 3: 2}


def test_c4_line_keep_rules(spark):
    """Each C4 rule (terminal punctuation, ≥5 words, blocklist) drops
    exactly the lines it should, and cleaned text preserves kept-line
    order."""
    from ksql_streams_from_schema_converter_spark.operators.text import c4_clean

    doc = "\n".join(
        [
            "this line has enough words and punctuation.",  # keep
            "too short.",  # < 5 words
            "this line has no terminal punctuation at all",  # no terminal
            "this line mentions javascript so it dies.",  # blocklist
            "curly brace { means template residue here.",  # blocklist
            "Lorem Ipsum dolor sit amet consectetur.",  # blocklist (case-insensitive)
            "another fine sentence that should survive!",  # keep
            "is this a question with enough words?",  # keep
        ]
    )
    out = c4_clean(
        spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    ).head()
    assert out.n_lines == 8
    assert out.n_kept == 3
    assert out.keep  # >= 3 kept lines
    assert out.cleaned.split("\n") == [
        "this line has enough words and punctuation.",
        "another fine sentence that should survive!",
        "is this a question with enough words?",
    ]
    # NULL text → empty result, not NULL propagation
    nul = c4_clean(
        spark.createDataFrame([(2, None)], "doc_id bigint, text string")
    ).head()
    assert (nul.n_lines, nul.n_kept, nul.keep) == (0, 0, False)


def test_substring_dup_stats_planted(corpus):
    """Planted exact copies must profile at dup_frac 1.0; their
    originals too (every window recurs in the copy). Documents outside
    the planted set can still share windows, but at least one fully
    unique-window doc should exist with dup_frac 0."""
    stats = D.duplicated_window_stats(corpus, window_tokens=8)
    copies = stats.where(F.col("doc_id") >= 20000)
    assert copies.count() == 25
    assert copies.where(F.col("dup_frac") < 1.0).count() == 0
    originals = stats.where(F.col("doc_id") < 25)
    assert originals.where(F.col("dup_frac") < 1.0).count() == 0
    # near-dups (first token dropped) share all windows not touching
    # the first token: high but it's the same value as original windows
    assert stats.where(F.col("dup_frac") == 0.0).count() > 0
    # window accounting: n_windows == n_tokens - 7 for a known doc
    row = stats.where(F.col("doc_id") == 0).head()
    n_tok = corpus.where(F.col("doc_id") == 0).select(
        F.size(F.split(F.trim(F.lower("text")), r"[ \t\n\f\r]+"))
    ).head()[0]
    assert row.n_windows == n_tok - 7


def test_gopher_null_text_lands_in_reject_partition(spark):
    """A NULL document must come out with all flags false (rejected),
    not vanish from both keep and reject via NULL verdicts — the same
    dirty-row contract as c4_clean."""
    from ksql_streams_from_schema_converter_spark.operators.text import (
        gopher_quality_flags,
    )

    flags = gopher_quality_flags(
        spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    )
    row = flags.head()
    assert row.n_tokens == 0 and row.keep is False
    assert flags.where("keep").count() + flags.where("NOT keep").count() == 1


def test_recall_verdicts_all_true_on_planted_corpus(spark):
    """The verdict frame that hash-gates the ANN driver rows: every
    boolean TRUE for every query id, one row per query (VERDICT r4 #1:
    approximate output is engine-specific, recall quality is not)."""
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    qids = list(range(5))
    corpus, _ = _planted_knn_corpus(spark, qids)
    emb = load_table(spark, SF_DIR, "embeddings")
    result = S.knn_ivf(corpus, qids, k=5, n_cells=8, nprobe=3)
    rows = S.recall_verdicts(result, emb, qids, k=5, min_query_hits=3).collect()
    assert sorted(r.query_id for r in rows) == qids
    for r in rows:
        assert r.topk_full and r.query_recall_ok and r.overall_recall_ok
        assert r.ids_disjoint


def test_recall_verdicts_flag_bad_results(spark):
    """A degenerate 'ANN' result (self-join garbage: every query paired
    with non-planted low ids) must turn the recall verdicts FALSE — the
    gate can actually fail, it is not tautological."""
    from ksql_streams_from_schema_converter_spark.sources.parquet import load_table

    qids = list(range(5))
    emb = load_table(spark, SF_DIR, "embeddings")
    fake = spark.createDataFrame(
        [(q, 400 + n, n + 1) for q in qids for n in range(3)],  # 3 < k, no planted
        "query_id long, neighbor_id long, rank int",
    )
    rows = S.recall_verdicts(fake, emb, qids, k=5, min_query_hits=1).collect()
    assert rows and all(not r.topk_full for r in rows)
    assert all(not r.query_recall_ok for r in rows)
    assert all(not r.overall_recall_ok for r in rows)
    assert all(r.ids_disjoint for r in rows)  # precondition itself still holds


def test_span_removal_cuts_all_but_first_occurrence(spark):
    """ExactSubstr policy (operators/dedup.duplicated_span_removal):
    a repeated >=k-token run is cut from every occurrence except the
    lexicographically-first; overlapping duplicated k-grams merge into
    ONE maximal span; unique docs pass through untouched."""
    import hashlib

    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        duplicated_span_removal,
    )

    boiler = "the quick brown fox jumps over the lazy dog again"  # 10 toks
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"one two three {boiler} four five six"),
            (3, "totally unique text with no repeats at all here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicated_span_removal(docs, k=8).collect()}
    # doc 1 owns the canonical first occurrence: nothing cut
    assert out[1].n_spans == 0 and out[1].n_removed == 0
    # doc 2: the 10-token boilerplate = three overlapping dup 8-grams
    # merged into ONE 10-token span
    assert out[2].n_spans == 1 and out[2].n_removed == 10
    assert out[3].n_spans == 0
    # reconstruction witness: doc 2's surviving text is exactly the
    # frame around the cut
    want = hashlib.md5(b"one two three four five six").hexdigest()
    assert out[2].clean_fp == want
    # untouched docs fingerprint their full token stream
    want3 = hashlib.md5(
        b"totally unique text with no repeats at all here"
    ).hexdigest()
    assert out[3].clean_fp == want3


def test_span_removal_within_doc_repeat(spark):
    """A k-gram repeated WITHIN one document keeps its first occurrence
    and cuts the second."""
    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        duplicated_span_removal,
    )

    run = "a b c d e f g h"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [(7, f"{run} x {run} y")], "doc_id long, text string"
    )
    out = duplicated_span_removal(docs, k=8).collect()[0]
    assert out.n_spans == 1 and out.n_removed == 8
    assert out.n_kept == 10  # 8 (first run) + x + y


def test_span_fingerprint_policy_and_wide_mode(spark):
    """VERDICT r8 #3 — the gram-fingerprint contract, pinned:

    DEFAULT (62-bit single bigint key): accepted over-removal policy.
    Birthday bound — expected colliding gram PAIRS at n distinct grams
    is ~n^2 / 2^63; each collision can cut ONE non-duplicate k-token
    span.  At a 100-TB corpus (~1e13 grams) that is ~5e6 spans of ~8
    tokens over ~1e13 tokens: ppm-level over-removal, the same posture
    as MinHash banding's false-positive buckets.

    WIDE (two independent 62-bit keys, ~124 bits): collisions require
    BOTH fingerprints to agree — expected pairs ~n^2 / 2^125, i.e.
    < 1e-12 even at 1e13 grams.  Exactness mode for callers whose
    contract forbids over-removal, at 2x the Horner work.

    Both modes must agree wherever no collision exists (always, at
    test scale)."""
    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        duplicated_span_removal,
    )

    # the policy arithmetic itself, as executable documentation
    n_grams = 10**13
    exp_pairs_62 = n_grams**2 / 2**63
    k = 8
    assert exp_pairs_62 * k / n_grams < 1e-5  # <10 ppm over-removal
    exp_pairs_124 = n_grams**2 / 2**125
    assert exp_pairs_124 < 1e-11  # effectively exact

    boiler = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"one two three {boiler} four five six"),
            (3, "totally unique text with no repeats at all here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    narrow = sorted(
        duplicated_span_removal(docs, k=8).collect(), key=lambda r: r.doc_id
    )
    wide = sorted(
        duplicated_span_removal(docs, k=8, wide_keys=True).collect(),
        key=lambda r: r.doc_id,
    )
    assert [tuple(r) for r in narrow] == [tuple(r) for r in wide]
    # and the wide plan really shuffles the 2-column key
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        duplicated_span_removal(docs, k=8, wide_keys=True).explain("formatted")
    plan = buf.getvalue()
    assert "g1" in plan and "g2" in plan


def test_span_removal_is_total_over_null_and_empty_text(spark):
    """NULL text is an empty token stream (0 spans, 0 kept, md5('')) —
    the non-total-helper class that bit cogroup's _fmt; unguarded,
    size(NULL) = -1 and sequence(0, -2) descends."""
    import hashlib

    from ksql_streams_from_schema_converter_spark.operators.dedup import (
        duplicated_span_removal,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "some ordinary words here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicated_span_removal(docs, k=8).collect()}
    assert out[1].n_spans == 0 and out[1].n_removed == 0
    assert out[1].n_kept == 0
    assert out[1].clean_fp == hashlib.md5(b"").hexdigest()
    assert out[2].n_kept == 4


def test_near_dup_banding_rejects_out_of_bound_hamming(spark):
    """ADVICE r9: the 4x16 banding is only exhaustive for Hamming <= 3
    (pigeonhole) — a larger max_hamming must fail loudly instead of
    silently missing pairs whose flipped bits hit all 4 bands."""
    import pytest

    from ksql_streams_from_schema_converter_spark.multimodal import (
        frame_dhash,
        frame_near_dup_pairs,
        near_dup_pairs,
        perceptual_dhash,
    )

    media = spark.createDataFrame(
        [(1, "image/fake", bytes(range(72)), 9, 8)],
        "doc_id long, media_type string, payload binary, meta_width int, meta_height int",
    )
    hashes = perceptual_dhash(media)
    with pytest.raises(ValueError, match="exactness bound"):
        near_dup_pairs(hashes, max_hamming=4)
    with pytest.raises(ValueError, match="exactness bound"):
        frame_near_dup_pairs(frame_dhash(media), max_hamming=7)
    # the bound itself is fine
    assert near_dup_pairs(hashes, max_hamming=3).count() == 0


def test_crossmodal_near_dup_planted_twins_and_bucketed_plan(spark):
    """VERDICT r9 #2: caption <-> media alignment through one shared
    hyperplane-LSH family — every planted x2-scaled caption finds its
    own media payload (identical direction => identical sketch =>
    recall exactly 1), naturals stay out, and the candidate plan is a
    bucketed equi-join, never a cartesian."""
    import contextlib
    import io

    from ksql_streams_from_schema_converter_spark.multimodal import (
        attach_fake_media,
        crossmodal_near_dup_pairs,
        payload_embedding,
    )

    # byte-level pseudo-random texts: proportional-offset byte vectors
    # of different docs are uncorrelated (near-identical prefixes like
    # "doc0 tok.." would alias every doc into one direction)
    import hashlib

    def _txt(i: int) -> str:
        return "".join(
            chr(33 + int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:2], 16) % 90)
            for j in range(96)
        )

    docs = spark.createDataFrame(
        [(i, _txt(i)) for i in range(30)], "doc_id long, text string"
    )
    mv = payload_embedding(attach_fake_media(docs)).localCheckpoint(eager=True)
    planted = mv.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000).alias("vec_id"),
        F.transform("v", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    # natural captions: orthogonal-ish synthetic vectors (alternating
    # signs scaled by caption id) — nowhere near any byte-vector
    naturals = spark.range(5).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> CAST(CASE WHEN d % 2 = 0 "
            "THEN id + 1 ELSE -(CAST(id AS INT) + 1) END AS DOUBLE))"
        ).alias("embedding"),
    )
    pairs = crossmodal_near_dup_pairs(
        naturals.unionByName(planted), mv, threshold=0.9
    )
    got = {(r.caption_id, r.media_id): r.cosine for r in pairs.collect()}
    assert got == {(1000 + i, i): 1.0 for i in (0, 10, 20)}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
