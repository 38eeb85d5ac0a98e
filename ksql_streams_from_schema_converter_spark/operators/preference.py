"""Pairwise-preference aggregation and Bradley-Terry strength fitting —
the reward-model data-prep half of an RLHF pipeline expressed as
distributed relational ops.

The Bradley-Terry model (Bradley & Terry, Biometrika 1952) fits one
strength pi_i per entity from pairwise win counts so that
P(i beats j) = pi_i / (pi_i + pi_j); the fit here is Hunter's MM
fixed-point (Hunter, "MM algorithms for generalized Bradley-Terry
models", Annals of Statistics 2004):

    pi_i' = W_i / sum_j n_ij / (pi_i + pi_j)

with W_i = i's total wins and n_ij = games between i and j, followed by
a mean-normalization each round.  This is the same estimator behind
Elo-style leaderboard aggregation of human preference votes (e.g.
Chatbot-Arena-style rankings) and reward-model pair weighting.

ENGINE-EXACT arithmetic: the update runs in scaled integers — ratings
are permille (start 1000), each reciprocal term is the truncating
division ``(n_ij * 1_000_000) div (pi_i + pi_j)``, and the round ends
with an integer mean-renormalization — so DuckDB replays the identical
sequence and the fixed point is value-hash-gated, the same discipline
as k-means (operators/clustering.py) and PageRank (operators/graph.py).
Truncation error per term is bounded by 1/1e6 relative; after the
rounds the ORDERING of ratings matches the float MM fit, which is what
a leaderboard consumes.

Scale shape: pair extraction is the only data-sized stage — a self-join
keyed by the grouping id whose blowup is bounded by the per-group row
cap (TPC-H orders have <= 7 lineitems -> <= 21 comparisons), i.e.
linear in input with a constant factor, shuffled once on the group key.
The iteration then runs on the ENTITY-pair matrix (|brands|^2 rows —
tiny), broadcast-joined per round; W_i and n_ij are computed once.
Iterations on a cached small table do not rescan the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reciprocal scaling for the MM inner division
BT_K = 1_000_000
#: rating scale (start + renormalized mean)
BT_SCALE = 1_000


def pairwise_wins(
    items: DataFrame,
    group_col: str,
    order_col: str,
    entity_col: str,
    value_col: str,
) -> DataFrame:
    """Turn co-grouped rows into pairwise preference outcomes: within
    each group, every pair of rows with DIFFERENT entities and
    DIFFERENT values is one comparison won by the higher value (ties
    and self-pairs are dropped — no information).  ``order_col`` de-
    duplicates the unordered pair (a.order < b.order), so each row
    pair is counted exactly once.

    Returns (winner, loser, n) win counts."""
    a = items.select(
        F.col(group_col).alias("__g"),
        F.col(order_col).alias("__oa"),
        F.col(entity_col).alias("__ea"),
        F.col(value_col).alias("__va"),
    )
    b = items.select(
        F.col(group_col).alias("__g"),
        F.col(order_col).alias("__ob"),
        F.col(entity_col).alias("__eb"),
        F.col(value_col).alias("__vb"),
    )
    pairs = a.join(b, "__g").where(
        (F.col("__oa") < F.col("__ob"))
        & (F.col("__ea") != F.col("__eb"))
        & (F.col("__va") != F.col("__vb"))
    )
    return (
        pairs.select(
            F.when(F.col("__va") > F.col("__vb"), F.col("__ea"))
            .otherwise(F.col("__eb"))
            .alias("winner"),
            F.when(F.col("__va") > F.col("__vb"), F.col("__eb"))
            .otherwise(F.col("__ea"))
            .alias("loser"),
        )
        .groupBy("winner", "loser")
        .agg(F.count("*").alias("n"))
    )


def bradley_terry_ratings(
    wins: DataFrame, n_iter: int = 6, entities_threshold: int = 100_000
) -> DataFrame:
    """Hunter-MM Bradley-Terry fixed point over a (winner, loser, n)
    win-count table, in exact scaled-integer arithmetic (module
    docstring).  Entities that appear only as losers get rating 0 on
    the first round (W_i = 0) — a true statement: BT's MLE for a
    never-winner is 0.

    Iteration discipline, two forms behind ``entities_threshold``
    (VERDICT r6 #3):

    - **collect form** (entity count <= threshold — the leaderboard
      shape): the pair matrix — the data-sized input — stays
      distributed and is scanned once per round behind a broadcast of
      the rating state; the state itself (|entities| rows, bounded the
      way k is bounded for k-means, operators/clustering.py) is
      collected per round and the normalization arithmetic runs in
      exact Python integers — identical values to the SQL form, since
      truncating ``//`` on positive operands is the same operation,
      with no per-round checkpoint jobs.
    - **join form** (entity count > threshold — ratings over users,
      documents, …): the rating state stays a DataFrame for the whole
      fit; each round is two equi-joins of the pair matrix against the
      state, a partial-aggregated d-sum, and a broadcast of the 1-row
      (rsum, n_e) normalizer, with a per-round eager localCheckpoint
      truncating the doubled lineage (the PageRank shape,
      operators/graph.py).  Nothing entity-sized ever reaches the
      driver.  The update algebra — including every zero guard — is
      the same recurrence; the normalization products run in
      DECIMAL(38,0) (the dsir_bucket_weights overflow discipline,
      since wtot*1e6 and raw*n_e*1000 are corpus-scale cross-products)
      and truncating decimal ``div`` equals Python ``//`` on positive
      operands, so both forms are value-identical (equivalence-tested
      in tests/test_preference.py).

    Returns (entity, wins, games, rating) after ``n_iter`` rounds."""
    assert n_iter >= 1
    spark = wins.sparkSession
    ents = (
        wins.select(F.col("winner").alias("i"))
        .union(wins.select(F.col("loser").alias("i")))
        .distinct()
    )
    w_i = wins.groupBy(F.col("winner").alias("i")).agg(
        F.sum("n").alias("wtot")
    )
    games = (
        wins.select(F.col("winner").alias("i"), F.col("loser").alias("j"), "n")
        .union(
            wins.select(
                F.col("loser").alias("i"), F.col("winner").alias("j"), "n"
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n"))
    )
    from .lifecycle import eager_release

    # materialize the static pair matrix once (scanned every round)
    games = eager_release(games)
    w_full = eager_release(
        ents.join(w_i, "i", "left").select(
            "i", F.coalesce("wtot", F.lit(0)).alias("wtot")
        )
    )
    g_tot = games.groupBy("i").agg(F.sum("n").alias("games"))
    # w_full is already materialized, so the dispatch count is free
    if w_full.count() > entities_threshold:
        final = _bt_join_rounds(games, w_full, n_iter)
        return final.join(w_full, "i").join(g_tot, "i").select(
            F.col("i").alias("entity"),
            F.col("wtot").alias("wins"),
            "games",
            F.col("pi").alias("rating"),
        )

    # bounded collects: |entities| rows each (the trained artifact)
    wtot = {r_["i"]: r_["wtot"] for r_ in w_full.collect()}
    pi = {i: BT_SCALE for i in wtot}

    from pyspark.sql import types as T

    etype = wins.schema["winner"].dataType
    r_schema = T.StructType(
        [
            T.StructField("i", etype),
            T.StructField("pi_i", T.LongType()),
            T.StructField("pi_j", T.LongType()),
        ]
    )
    # ZERO GUARDS (ADVICE r6), identical on both engines and in the
    # oracle: (1) each reciprocal term divides by greatest(pi_i+pi_j, 1)
    # — without it a pair of zero-pi entities is NULL in Spark (ANSI
    # off) but a division-by-zero ERROR in DuckDB; (2) d is floored at
    # 1 — with many entities each term (n*1e6) div (pi_i+pi_j) can
    # truncate to 0 when one pi dominates the renormalized mass, and
    # d=0 would crash the raw division; (3) rsum is floored at 1 (all-
    # zero raw is the degenerate composition of (2)); (4) a renormalized
    # pi is floored at 1 for entities with wtot > 0, so a weak-but-
    # winning entity can never be truncated into the never-winner class
    # (pi=0), which would otherwise re-create (1) next round.
    for _ in range(n_iter):
        r_df = spark.createDataFrame(
            [(i, p, p) for i, p in sorted(pi.items())], r_schema
        )
        d_rows = (
            games.join(F.broadcast(r_df.select("i", "pi_i")), "i")
            .join(
                F.broadcast(
                    r_df.select(F.col("i").alias("j"), "pi_j")
                ),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(
                    F.expr(f"(n * {BT_K}) div greatest(pi_i + pi_j, 1)")
                ).alias("d")
            )
            .collect()
        )
        raw = {
            r_["i"]: (wtot[r_["i"]] * BT_K) // max(r_["d"], 1)
            for r_ in d_rows
        }
        rsum, n_e = max(sum(raw.values()), 1), len(raw)
        pi = {
            i: max((v * n_e * BT_SCALE) // rsum, 1 if wtot[i] > 0 else 0)
            for i, v in raw.items()
        }
    final = spark.createDataFrame(
        [(i, p) for i, p in sorted(pi.items())],
        T.StructType(
            [T.StructField("i", etype), T.StructField("pi", T.LongType())]
        ),
    )
    return (
        F.broadcast(final)
        .join(w_full, "i")
        .join(g_tot, "i")
        .select(
            F.col("i").alias("entity"),
            F.col("wtot").alias("wins"),
            "games",
            F.col("pi").alias("rating"),
        )
    )


def _bt_join_rounds(
    games: DataFrame, w_full: DataFrame, n_iter: int
) -> DataFrame:
    """The MM recurrence with the rating state kept DISTRIBUTED — for
    entity sets too large to collect (VERDICT r6 #3).  Per round: two
    equi-joins of the (materialized) pair matrix against the state, a
    partial-aggregated d-sum, one bounded 1-row broadcast for the
    normalizer, and an eager localCheckpoint truncating the lineage
    the state's double reference would otherwise double per round
    (the PageRank discipline, operators/graph.py).  Identical guarded
    arithmetic to the collect form: truncating ``div`` on positive
    DECIMAL(38,0) products == Python ``//`` on exact ints as long as
    the products fit 38 digits (they do until raw*n_e*1000 ~ 1e38,
    twenty orders past any real leaderboard).  Returns ``(i, pi)``."""
    r = w_full.select(
        "i", F.lit(BT_SCALE).cast("long").alias("pi")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        d = (
            games.join(
                r.select("i", F.col("pi").alias("pi_i")), "i"
            )
            .join(
                r.select(F.col("i").alias("j"), F.col("pi").alias("pi_j")),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(
                    F.expr(f"(n * {BT_K}) div greatest(pi_i + pi_j, 1)")
                ).alias("d")
            )
        )
        # every entity appears in games (both directions unioned), so
        # the inner join covers the whole entity set
        raw = w_full.join(d, "i").select(
            "i",
            "wtot",
            F.expr(
                f"cast((cast(wtot as decimal(38,0)) * {BT_K})"
                " div greatest(d, 1) as bigint)"
            ).alias("raw"),
        )
        stats = raw.agg(
            F.greatest(F.sum("raw"), F.lit(1).cast("long")).alias("rsum"),
            F.count("*").alias("n_e"),
        )
        new_r = raw.crossJoin(F.broadcast(stats)).select(
            "i",
            F.greatest(
                F.expr(
                    f"cast((cast(raw as decimal(38,0)) * n_e * {BT_SCALE})"
                    " div rsum as bigint)"
                ),
                F.when(F.col("wtot") > 0, F.lit(1))
                .otherwise(F.lit(0))
                .cast("long"),
            ).alias("pi"),
        )
        r = new_r.localCheckpoint(eager=True)
    return r


def bt_oracle_sql(n_iter: int = 6, pairs_cte: str = "") -> str:
    """Unrolled-CTE DuckDB twin of :func:`bradley_terry_ratings` —
    ``pairs_cte`` must define ``wins(winner, loser, n)``.  Every sum
    is cast to BIGINT (DuckDB SUM promotes to HUGEINT) and every
    division is the same truncating integer ``//`` on positive
    operands that Spark's ``div`` performs."""
    # every CTE is MATERIALIZED: d/raw and the r-chain each reference
    # their predecessor TWICE, so DuckDB's default inlining would
    # replicate the pair-extraction subtree 4^n_iter times (observed as
    # fd exhaustion on the parquet scans); materialization makes the
    # unrolled plan linear, mirroring the Spark side's per-round
    # lineage truncation
    ctes = [
        pairs_cte.replace("wins AS (", "wins AS MATERIALIZED (", 1),
        "ents AS MATERIALIZED "
        "(SELECT winner AS i FROM wins UNION SELECT loser FROM wins)",
        "wi AS MATERIALIZED (SELECT e.i, CAST(COALESCE((SELECT sum(n) "
        "FROM wins w"
        " WHERE w.winner = e.i), 0) AS BIGINT) AS wtot FROM ents e)",
        "g AS MATERIALIZED (SELECT i, j, CAST(sum(n) AS BIGINT) AS n FROM ("
        "SELECT winner AS i, loser AS j, n FROM wins "
        "UNION ALL SELECT loser, winner, n FROM wins) GROUP BY i, j)",
        f"r0 AS MATERIALIZED "
        f"(SELECT i, CAST({BT_SCALE} AS BIGINT) AS pi FROM ents)",
    ]
    # the greatest() guards are the operator's zero guards (ADVICE r6)
    # replayed verbatim — see bradley_terry_ratings' round loop
    for t in range(1, n_iter + 1):
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT g.i, CAST(sum((g.n * {BT_K}) // "
            f"greatest(ra.pi + rb.pi, 1)) AS BIGINT) AS d FROM g "
            f"JOIN r{t - 1} ra ON ra.i = g.i "
            f"JOIN r{t - 1} rb ON rb.i = g.j GROUP BY g.i)"
        )
        ctes.append(
            f"raw{t} AS MATERIALIZED "
            f"(SELECT d.i, (wi.wtot * {BT_K}) // greatest(d.d, 1) AS raw "
            f"FROM d{t} d JOIN wi ON wi.i = d.i)"
        )
        ctes.append(
            f"s{t} AS MATERIALIZED "
            f"(SELECT greatest(CAST(sum(raw) AS BIGINT), 1) AS rsum, "
            f"CAST(count(*) AS BIGINT) AS n_e FROM raw{t})"
        )
        ctes.append(
            f"r{t} AS MATERIALIZED "
            f"(SELECT raw{t}.i, greatest((raw * n_e * {BT_SCALE}) // rsum, "
            f"CASE WHEN wi.wtot > 0 THEN 1 ELSE 0 END) AS pi "
            f"FROM raw{t} JOIN wi ON wi.i = raw{t}.i, s{t})"
        )
    body = ",\n    ".join(c for c in ctes if c)
    return f"""
    WITH {body},
    gt AS (SELECT i, CAST(sum(n) AS BIGINT) AS games FROM g GROUP BY i)
    SELECT r.i AS entity, wi.wtot AS wins, gt.games, r.pi AS rating
    FROM r{n_iter} r JOIN wi ON wi.i = r.i JOIN gt ON gt.i = r.i
    """


def dpo_pairs(
    responses: DataFrame,
    group_col: str,
    id_col: str,
    reward_col: str,
    min_margin: int = 0,
) -> DataFrame:
    """DPO/RLHF preference-pair construction (Rafailov et al., NeurIPS
    2023 consume exactly this shape): per prompt group, elect the
    CHOSEN response (highest reward) and the REJECTED response (lowest
    reward) and emit one ``(group, chosen_id, rejected_id, margin)``
    pair, keeping groups whose margin exceeds ``min_margin`` (a zero
    margin means no preference signal — groups with one response or
    all-equal rewards drop out).

    Election is ``max/min(struct(reward, ±id))`` — ONE partial-
    aggregating groupBy (the corpus-line-dedup discipline: a skewed
    prompt with millions of responses collapses to one partial
    extremum per map task; no window, no per-group sort).  Ties break
    deterministically: both elections prefer the LOWEST id among
    their tied rows (chosen via the negated id inside the max), so
    chosen_id != rejected_id whenever the margin test passes and the
    whole table is value-hash-gateable.

    Scale: one shuffle keyed by the group, output one row per group —
    the smallest of the preference-prep family (pairwise_wins fans out
    per-pair; this folds to extrema)."""
    g, i, r = F.col(group_col), F.col(id_col), F.col(reward_col)
    # lowest id among max-reward rows: negate the id inside the max
    chosen = F.max(F.struct(r.alias("r"), (-i).alias("ni")))
    rejected = F.min(F.struct(r.alias("r"), i.alias("i")))
    out = (
        responses.groupBy(g.alias("grp"))
        .agg(chosen.alias("__c"), rejected.alias("__r"))
        .select(
            F.col("grp").alias(group_col),
            (-F.col("__c.ni")).alias("chosen_id"),
            F.col("__r.i").alias("rejected_id"),
            (F.col("__c.r") - F.col("__r.r")).alias("margin"),
        )
        .where(F.col("margin") > min_margin)
    )
    return out


def dpo_oracle_sql(responses_cte: str, group_col: str, min_margin: int = 0) -> str:
    """DuckDB replay of :func:`dpo_pairs` over a ``responses`` CTE with
    columns (``group_col``, id, reward): identical extremum election
    with the same deterministic tie-breaks."""
    return f"""
    WITH responses AS ({responses_cte}),
    agg AS (
      SELECT {group_col},
             max({{'r': reward, 'ni': -id}}) AS c,
             min({{'r': reward, 'i': id}}) AS rj,
             max(reward) - min(reward) AS margin
      FROM responses GROUP BY {group_col}
    )
    SELECT {group_col}, -(c.ni) AS chosen_id, (rj).i AS rejected_id,
           CAST(margin AS BIGINT) AS margin
    FROM agg WHERE margin > {min_margin}
    """
