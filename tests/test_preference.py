"""Bradley-Terry preference fitting (operators/preference.py)."""

from ksql_streams_from_schema_converter_spark.operators.preference import (
    bradley_terry_ratings,
    pairwise_wins,
)


def test_pairwise_wins_contract(spark):
    """Each unordered row pair counted once; ties and same-entity
    pairs dropped; higher value wins."""
    items = spark.createDataFrame(
        [
            # group 1: A(3.0), B(1.0), B(3.0) -> A>B (lines 1,2),
            # A vs B tie at 3.0 dropped (lines 1,3), B>B self dropped
            (1, 1, "A", 3.0),
            (1, 2, "B", 1.0),
            (1, 3, "B", 3.0),
            # group 2: C(5.0) alone -> nothing
            (2, 1, "C", 5.0),
        ],
        "g long, ln long, ent string, v double",
    )
    wins = {
        (r.winner, r.loser): r.n
        for r in pairwise_wins(items, "g", "ln", "ent", "v").collect()
    }
    assert wins == {("A", "B"): 1}


def test_bt_ratings_order_and_never_winner(spark):
    """Lopsided round-robin: A dominates B dominates C; D never wins a
    game.  The fitted ordering must be A > B > C > D and the
    never-winner's MLE strength is exactly 0."""
    wins = spark.createDataFrame(
        [
            ("A", "B", 9),
            ("B", "A", 1),
            ("B", "C", 9),
            ("C", "B", 1),
            ("A", "C", 9),
            ("C", "A", 1),
            ("A", "D", 5),
            ("B", "D", 5),
        ],
        "winner string, loser string, n long",
    )
    out = {r.entity: r for r in bradley_terry_ratings(wins, n_iter=6).collect()}
    assert out["D"].rating == 0 and out["D"].wins == 0 and out["D"].games == 10
    assert out["A"].rating > out["B"].rating > out["C"].rating > 0
    assert out["A"].wins == 23 and out["A"].games == 25
    # ratings stay on the permille scale (mean-normalized each round)
    assert sum(r.rating for r in out.values()) <= 4 * 1000


def test_bt_zero_guards_weak_winner_and_dominance(spark):
    """ADVICE r6 pathologies: (a) a weak-but-winning entity whose raw
    rating truncates to 0 must be floored at pi=1, never re-entering
    the never-winner class; (b) the resulting near-zero pair sums and
    the dominance-truncated d=0 rounds must not crash either engine;
    (c) the DuckDB oracle replays the guarded recurrence to identical
    ratings."""
    from ksql_streams_from_schema_converter_spark.operators.preference import (
        bradley_terry_ratings,
        bt_oracle_sql,
    )

    # A beats B a million times; B beats C once; C never wins.
    # Round 1 drives B's raw to 0 (old code: pi_B = 0, then the B+C
    # pair divides by zero on round 2 — NULL in Spark, error in DuckDB).
    wins = spark.createDataFrame(
        [("A", "B", 1_000_000), ("B", "C", 1)],
        "winner string, loser string, n long",
    )
    out = {
        r["entity"]: r["rating"]
        for r in bradley_terry_ratings(wins, n_iter=4).collect()
    }
    assert out["C"] == 0  # true never-winner: BT MLE is 0
    assert out["B"] >= 1  # weak winner floored, not zeroed
    assert out["A"] > out["B"] > out["C"]

    import duckdb

    sql = bt_oracle_sql(
        n_iter=4,
        pairs_cte="wins AS (SELECT * FROM (VALUES "
        "('A', 'B', CAST(1000000 AS BIGINT)), ('B', 'C', CAST(1 AS BIGINT))"
        ") t(winner, loser, n))",
    )
    con = duckdb.connect()
    oracle = {e: r for e, _, _, r in con.execute(sql).fetchall()}
    con.close()
    assert oracle == out


def test_bt_dominant_entity_d_truncation_no_crash(spark):
    """>1000 entities with one dominant winner: after round 1 the
    dominant pi holds nearly the whole renormalized mass, so every
    round-2 reciprocal term truncates to 0 and d=0 — the max(d, 1)
    guard must absorb it (old code: ZeroDivisionError on the driver)."""
    from ksql_streams_from_schema_converter_spark.operators.preference import (
        bradley_terry_ratings,
    )

    wins = spark.createDataFrame(
        [("top", f"e{i:04d}", 1) for i in range(1200)],
        "winner string, loser string, n long",
    )
    res = bradley_terry_ratings(wins, n_iter=3).collect()
    by_ent = {r["entity"]: r["rating"] for r in res}
    assert len(by_ent) == 1201
    assert by_ent["top"] == max(by_ent.values())
    assert all(v == 0 for e, v in by_ent.items() if e != "top")


def test_bt_join_form_equals_collect_form(spark):
    """entities_threshold switch (VERDICT r6 #3): the distributed
    join-form rounds must produce bit-identical ratings to the
    collect form, on both the regular fixture and the pathological
    weak-winner one."""
    from ksql_streams_from_schema_converter_spark.operators.preference import (
        bradley_terry_ratings,
    )

    fixtures = [
        [("A", "B", 3), ("B", "C", 2), ("C", "A", 1), ("A", "C", 4)],
        [("A", "B", 1_000_000), ("B", "C", 1)],  # weak-winner guards
        [("top", f"e{i:03d}", 1) for i in range(40)],  # dominance
    ]
    for rows in fixtures:
        wins = spark.createDataFrame(
            rows, "winner string, loser string, n long"
        )
        collect_form = sorted(
            tuple(r)
            for r in bradley_terry_ratings(
                wins, n_iter=4, entities_threshold=100_000
            ).collect()
        )
        join_form = sorted(
            tuple(r)
            for r in bradley_terry_ratings(
                wins, n_iter=4, entities_threshold=0
            ).collect()
        )
        assert join_form == collect_form, rows[:2]


def test_dpo_pairs_elects_extrema_with_deterministic_ties(spark):
    """DPO pair construction: chosen = max reward (lowest id on ties),
    rejected = min reward (also lowest id on ties), zero-margin
    groups drop, and the plan is one partial-aggregating groupBy — no window."""
    import contextlib
    import io

    from ksql_streams_from_schema_converter_spark.operators.preference import (
        dpo_pairs,
    )

    rows = [
        # group 1: clear winner/loser
        (1, 1, 10), (1, 2, 30), (1, 3, 5),
        # group 2: tie at the top (ids 4,5) and bottom (ids 6,7)
        (2, 4, 50), (2, 5, 50), (2, 6, 1), (2, 7, 1),
        # group 3: all equal -> no signal, drops
        (3, 8, 9), (3, 9, 9),
        # group 4: single response -> margin 0, drops
        (4, 10, 99),
    ]
    df = spark.createDataFrame(rows, "grp long, id long, reward long")
    out = {r.grp: r for r in dpo_pairs(df, "grp", "id", "reward").collect()}
    assert set(out) == {1, 2}
    assert (out[1].chosen_id, out[1].rejected_id, out[1].margin) == (2, 3, 25)
    # ties: both elections take the LOWEST id among the tied rows —
    # deterministic, and distinct whenever margin > 0 (the tied sets
    # are at different rewards)
    assert (out[2].chosen_id, out[2].rejected_id, out[2].margin) == (4, 6, 49)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dpo_pairs(df, "grp", "id", "reward").explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan and "partial_max" in plan
