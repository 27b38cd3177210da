"""BPE tokenizer training/inference (operators/bpe.py): the distributed
merge loop must equal the classic in-memory algorithm merge-for-merge
(count, tie-break, and left-to-right non-overlapping rewrite), and
application must segment exactly like training did."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from carto_etl_spark.operators.bpe import apply_bpe, train_bpe, word_counts


def _ref_bpe(words: dict[str, int], k: int):
    """Textbook BPE on a word-count dict (Sennrich et al. 2016), with the
    operator's deterministic tie-break (count DESC, left ASC, right ASC)."""
    state = {tuple(w): c for w, c in words.items()}
    out = []
    for rank in range(1, k + 1):
        pc = Counter()
        for toks, c in state.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += c
        if not pc:
            break
        (a, b), c = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        out.append((rank, a, b, a + b, c))
        new: dict[tuple, int] = {}
        for toks, cnt in state.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            key = tuple(merged)
            new[key] = new.get(key, 0) + cnt
        state = new
    return out


def _got(df):
    return [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]


def test_train_matches_reference(spark):
    words = {"low": 3, "lower": 2, "lowest": 1, "new": 2, "newer": 1}
    wdf = spark.createDataFrame(list(words.items()), "word string, cnt long")
    assert _got(train_bpe(wdf, 6)) == _ref_bpe(words, 6)


def test_overlapping_pair_merges_left_to_right(spark):
    # "aaa" holds the (a,a) pair twice (overlap counted, as in the
    # original get_stats) but merges only once: [aa, a]
    words = {"aaa": 1, "abab": 2}
    wdf = spark.createDataFrame(list(words.items()), "word string, cnt long")
    assert _got(train_bpe(wdf, 3)) == _ref_bpe(words, 3)
    # reference sanity: (a,b) counted 4 = 2 occurrences x weight 2
    assert _ref_bpe(words, 1)[0][4] == 4


def test_early_stop_when_no_pairs_remain(spark):
    wdf = spark.createDataFrame([("ab", 5)], "word string, cnt long")
    got = _got(train_bpe(wdf, 10))
    assert got == [(1, "a", "b", "ab", 5)]  # then no pair is left


def test_single_char_words_produce_no_merges(spark):
    wdf = spark.createDataFrame(
        [("a", 9), ("b", 4)], "word string, cnt long"
    )
    assert _got(train_bpe(wdf, 4)) == []


def test_word_counts_ascii_lowercase_only(spark):
    docs = spark.createDataFrame(
        [(1, "Foo foo BAR! b4r; cézanne")], "doc_id long, text string"
    )
    got = {
        (r["word"], r["cnt"]) for r in word_counts(docs, "text").collect()
    }
    # "cézanne" splits at the non-ASCII char; digits split "b4r"
    assert got == {
        ("foo", 2),
        ("bar", 1),
        ("b", 1),
        ("r", 1),
        ("c", 1),
        ("zanne", 1),
    }


def test_apply_segments_like_training(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "newest new")],
        "doc_id long, text string",
    )
    merges = train_bpe(word_counts(docs, "text"), 6)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    out = {
        r["doc_id"]: r["tokens"]
        for r in apply_bpe(docs, "text", rules).collect()
    }
    # re-derive expected segmentation with the python reference rewriter
    def seg(word):
        toks = list(word)
        for a, b in rules:
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            toks = merged
        return toks

    assert out[1] == seg("low") + seg("lower") + seg("lowest")
    assert out[2] == seg("newest") + seg("new")


def test_apply_is_scan_stage_only(spark):
    """Tokenization must stay a codegen projection: no exchange, no
    Python eval in the plan."""
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    out = apply_bpe(docs, "text", [("a", "b")])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_empty_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab")], "doc_id long, text string"
    )
    merges = train_bpe(word_counts(docs, "text"), 2)
    rules = [(r["left"], r["right"]) for r in merges.collect()]
    out = {
        r["doc_id"]: r["tokens"]
        for r in apply_bpe(docs, "text", rules).collect()
    }
    assert out[1] == []
    assert out[2] is None or out[2] == []
    assert out[3] == ["ab"]


def test_driver_and_distributed_loops_are_identical(spark):
    """The broadcast-vocab driver fast path must equal the distributed
    iterations merge-for-merge (forced via driver_threshold_words=0) and
    the textbook reference — on a corpus with overlaps and ties."""
    words = {"abab": 3, "aaa": 2, "bab": 2, "low": 3, "lower": 2, "xy": 1}
    wdf = spark.createDataFrame(list(words.items()), "word string, cnt long")
    via_driver = _got(train_bpe(wdf, 5))
    via_dist = _got(train_bpe(wdf, 5, driver_threshold_words=0))
    assert via_driver == via_dist == _ref_bpe(words, 5)
