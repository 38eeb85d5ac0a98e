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
