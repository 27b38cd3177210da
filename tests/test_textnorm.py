"""Unicode normalization: hand-computed form pins + plan gates."""

from carto_etl_spark.operators import textnorm


def test_forms_hand_cases(spark):
    cases = [
        # combining e + U+0301: NFC composes, fold strips the accent
        (0, "Cafe\u0301", "Caf\xe9", "Caf\xe9", "cafe"),
        # precomposed: NFC idempotent, same fold key as the combining form
        (1, "Caf\xe9", "Caf\xe9", "Caf\xe9", "cafe"),
        # ligature: NFC keeps it, NFKC expands, fold lowercases
        (2, "\ufb01n", "\ufb01n", "fin", "fin"),
        # full case fold: casefold('\xdf') = 'ss' where lower() keeps '\xdf'
        (3, "STRA\xdfE", "STRA\xdfE", "STRA\xdfE", "strasse"),
        # fullwidth digit + superscript are NFKC-compat, not NFC
        (4, "\uff11\xb2", "\uff11\xb2", "12", "12"),
        # pure ASCII passes through NFC/NFKC untouched
        (5, "plain ASCII", "plain ASCII", "plain ASCII", "plain ascii"),
        (6, None, None, None, None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in cases], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.nfc, r.nfkc, r.fold_key)
        for r in textnorm.with_normalized(df, "text").collect()
    }
    for i, _, nfc, nfkc, fold in cases:
        assert got[i] == (nfc, nfkc, fold), f"case {i}: {got[i]}"


def test_fold_key_unifies_byte_variants(spark):
    # the dedup motivation: every spelling of "caf\xe9 fin" folds to one key
    variants = ["Cafe\u0301 \ufb01n", "CAF\xc9 FIN", "caf\xe9 fin"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(variants)], "doc_id long, text string"
    )
    keys = {
        r.fold_key for r in textnorm.with_normalized(df, "text").collect()
    }
    assert keys == {"cafe fin"}


def test_plans_one_arrow_pass_no_exchange(spark):
    # one Arrow round-trip for all three forms, no shuffle, no row-at-a-time
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        textnorm.with_normalized(df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
