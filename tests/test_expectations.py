"""Data-quality expectations: planted-violation counts and the
single-pass plan shape."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators import expectations as E


def _frame(spark):
    rows = [
        (1, "O", 10.0, "ok"),
        (2, "F", -5.0, "ok"),      # range violation
        (3, "X", 20.0, "ok"),      # accepted_values violation
        (4, None, 30.0, "bad!"),   # not_null + matches violations
        (5, "O", None, "ok"),      # range violation (NULL counts)
        (5, "O", 40.0, "ok"),      # duplicate key 5
    ]
    return spark.createDataFrame(rows, "k long, status string, amount double, tag string")


def test_planted_violations_counted_exactly(spark):
    out = {
        r.rule: r.n_violations
        for r in E.check(
            _frame(spark),
            [
                E.not_null("status"),
                E.in_range("amount", 0, 100),
                E.accepted_values("status", ["O", "F"]),
                E.matches("tag", "^ok$"),
            ],
            unique_keys=[["k"]],
        ).collect()
    }
    assert out == {
        "not_null(status)": 1,
        "range(amount,0,100)": 2,
        "accepted_values(status)": 2,  # 'X' and NULL
        "matches(tag)": 1,
        "unique(k)": 2,  # both rows of the duplicated key count
    }


def test_no_violations_all_zero(spark):
    df = spark.createDataFrame([(1, "O"), (2, "F")], "k long, status string")
    out = E.check(
        df,
        [E.not_null("status"), E.accepted_values("status", ["O", "F"])],
        unique_keys=[["k"]],
    ).collect()
    assert all(r.n_violations == 0 for r in out)
    assert len(out) == 3


def test_row_level_rules_are_one_aggregate_pass(spark):
    """However many row-level rules, the plan contains exactly one
    aggregation over the input (count_if per rule inside it) — adding
    a rule must not add a scan."""
    df = _frame(spark)
    checked = E.check(
        df,
        [
            E.not_null("status"),
            E.in_range("amount", 0, 100),
            E.accepted_values("status", ["O", "F"]),
            E.matches("tag", "^ok$"),
        ],
    )
    plan = checked._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") <= 1


def test_observe_rules_rides_an_existing_action(spark):
    """Violation counters come back from the caller's own action (one
    noop write here) — observe attaches the aggregates to that job, so
    validation adds zero extra scans by construction."""
    df = _frame(spark)
    observed, obs = E.observe_rules(
        df, [E.not_null("status"), E.in_range("amount", 0, 100)]
    )
    observed.write.format("noop").mode("overwrite").save()
    metrics = obs.get
    assert metrics["not_null(status)"] == 1
    assert metrics["range(amount,0,100)"] == 2
