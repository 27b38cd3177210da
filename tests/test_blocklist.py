"""Term-blocklist filtering: hand cases, phrase precedence, validation."""

import pytest

from carto_etl_spark.operators import blocklist as B


def test_flag_hand_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "a SLOW query and a hash value here"),
            (2, "slowly is not slow-matched as a word"),  # 'slowly' != term
            (3, "clean text"),
            (4, "hash alone is fine; value alone is fine"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_blocked, r.blocked, r.first_term)
        for r in B.flag(df, "text", ("slow", "hash value")).collect()
    }
    assert got[1] == (2, True, "slow")
    # 'slowly' has no word boundary after 'slow'; 'slow-matched' DOES
    # boundary at the hyphen — that one hit is the whole count
    assert got[2] == (1, True, "slow")
    assert got[3] == (0, False, "")
    assert got[4] == (0, False, "")


def test_phrase_wins_over_prefix_word(spark):
    df = spark.createDataFrame([(1, "the hash value x")], "doc_id long, text string")
    (r,) = B.flag(df, "text", ("hash", "hash value")).collect()
    assert (r.n_blocked, r.first_term) == (1, "hash value")


def test_rejects_regex_injection_and_empty():
    with pytest.raises(ValueError):
        B.blocklist_pattern(("a|b(",))
    with pytest.raises(ValueError):
        B.blocklist_pattern(())


def test_plans_no_exchange_no_udf(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        B.flag(df, "text", ("slow",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
