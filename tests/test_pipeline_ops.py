"""Training-pipeline operators: deterministic sampling / packing
(operators/sampling.py), benchmark decontamination (operators/decontam.py),
PII scrubbing (operators/scrub.py), and repetition stats (operators/text.py).

Semantics on hand-built frames plus the plan-shape properties that make each
operator survive a 100x scale-up (sampling must stay a scan filter, packing
must shuffle once, decontamination must broadcast the benchmark side)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from carto_etl_spark.operators import decontam as dc
from carto_etl_spark.operators import sampling as smp
from carto_etl_spark.operators import scrub as sc
from carto_etl_spark.operators import text as tx
from carto_etl_spark.plans.inspect import explain_str, shuffle_count

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k for r in smp.hash_sample(df, "k", 0.3, salt=1).collect()}
    b = {r.k for r in smp.hash_sample(df.repartition(13), "k", 0.3, salt=1).collect()}
    assert a == b  # keep/drop is a pure function of the key
    # ... and the realized rate is near the nominal one (3-round Lehmer mixes
    # sequential ids; a one-round hash kept 100% here)
    assert 0.27 < len(a) / 5000 < 0.33


def test_hash_sample_salt_decorrelates(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k for r in smp.hash_sample(df, "k", 0.3, salt=1).collect()}
    b = {r.k for r in smp.hash_sample(df, "k", 0.3, salt=2).collect()}
    overlap = len(a & b) / len(a)
    assert 0.15 < overlap < 0.45  # independent draws would overlap ~30%


def test_hash_sample_monotone_rates(spark):
    # a row kept at rate r stays kept at any higher rate (threshold semantics)
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    low = {r.k for r in smp.hash_sample(df, "k", 0.2).collect()}
    high = {r.k for r in smp.hash_sample(df, "k", 0.6).collect()}
    assert low <= high


def test_hash_sample_rejects_bad_rate(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        smp.hash_sample(df, "k", 1.5)


def test_stratified_sample_rates_per_stratum(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = smp.stratified_sample(df, "k", "lang", {"en": 0.1}, default_rate=1.0)
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert by_lang["de"] == 2000          # untouched stratum keeps everything
    assert 140 < by_lang["en"] < 260      # ~10% of 2000


def test_stratified_sample_is_scan_stage_filter(spark):
    # the scale contract: no Exchange anywhere — sampling must not shuffle
    df = spark.read.parquet(f"{SF}/documents.parquet")
    out = smp.stratified_sample(df, "doc_id", "lang", {"en": 0.5})
    assert shuffle_count(out) == 0


def test_temperature_mixture_plan_math(spark):
    import math

    counts = {"en": 1600, "zh": 400, "fr": 100}
    # alpha=0.5: weights sqrt(n)/S with S summed in sorted-name order
    s_sum = math.sqrt(1600) + math.sqrt(400) + math.sqrt(100)
    plan = smp.temperature_mixture_plan(counts, total_target=1000, alpha=0.5)
    for lang, n in counts.items():
        rate = min(1.0, (1000 * (math.sqrt(n) / s_sum)) / n)
        assert plan[lang] == int(rate * smp.LEHMER_M), lang
    # flattening: small sources get HIGHER keep rates than big ones
    assert plan["fr"] > plan["zh"] > plan["en"]
    # alpha=1 is proportional: every source keeps the same rate
    prop = smp.temperature_mixture_plan(counts, total_target=1050, alpha=1.0)
    assert len({prop[lang] for lang in counts}) == 1
    # a source whose target exceeds its size caps at keep-everything
    capped = smp.temperature_mixture_plan(
        {"a": 10, "b": 100000}, total_target=90000, alpha=0.5
    )
    assert capped["a"] == smp.LEHMER_M
    # empty sources are dropped, not divided by
    assert "z" not in smp.temperature_mixture_plan(
        {"z": 0, "a": 10}, total_target=5
    )


def test_temperature_mixture_is_scan_stage_filter(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    out = smp.temperature_mixture(df, "doc_id", "lang", target_fraction=0.5)
    assert shuffle_count(out) == 0
    # deterministic under repartitioning
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in smp.temperature_mixture(
            df.repartition(7), "doc_id", "lang", target_fraction=0.5
        ).collect()
    }
    assert a == b and len(a) > 0


def test_group_sample_exact_quota_and_determinism(spark):
    rows = [(i, f"g{i % 7}") for i in range(700)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out1 = smp.group_sample(df, "g", "k", k=5).collect()
    out2 = smp.group_sample(df.repartition(11), "g", "k", k=5).collect()
    assert sorted((r.k, r.g) for r in out1) == sorted((r.k, r.g) for r in out2)
    counts = {r["g"]: r["n"] for r in smp.group_sample(df, "g", "k", k=5)
              .groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert set(counts.values()) == {5}


def test_group_sample_small_group_keeps_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["k", "g"])
    out = smp.group_sample(df, "g", "k", k=10)
    assert out.count() == 3
    assert "__rn" not in out.columns


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_boundary_semantics(spark):
    # budget 10; cumulative-before: 0,6,12,15,24 -> seq 0,0,1,1,2
    rows = [(1, 6), (2, 6), (3, 3), (4, 9), (5, 2)]
    df = spark.createDataFrame(rows, ["k", "nt"])
    out = {r.k: r.seq_id for r in
           smp.pack_sequences(df, "nt", "k", budget=10).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_pack_sequences_partition_local(spark):
    # identical token streams in two shards pack identically and independently
    rows = [(i, s, 4) for s in ("a", "b") for i in range(6)]
    df = spark.createDataFrame(rows, ["k", "src", "nt"])
    packed = smp.pack_sequences(df, "nt", "k", budget=8, partition="src")
    stats = smp.pack_stats(packed, "nt", partition="src")
    got = {(r.src, r.seq_id): (r.n_docs, r.total_tokens) for r in stats.collect()}
    assert got == {(s, q): (2, 8) for s in ("a", "b") for q in (0, 1, 2)}


def test_pack_sequences_overflow_by_one_doc_max(spark):
    # a document larger than the budget occupies its own sequence and the
    # boundary accounting continues (greedy boundary-crossing contract)
    rows = [(1, 3), (2, 25), (3, 3)]
    df = spark.createDataFrame(rows, ["k", "nt"])
    out = {r.k: r.seq_id for r in
           smp.pack_sequences(df, "nt", "k", budget=10).collect()}
    assert out == {1: 0, 2: 0, 3: 2}  # 3+25=28 before doc 3 -> floor(28/10)=2


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 1)], ["k", "nt"])
    with pytest.raises(ValueError):
        smp.pack_sequences(df, "nt", "k", budget=0)


def test_pack_sequences_single_shuffle(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", tx.token_count_expr("text").alias("nt"))
    packed = smp.pack_sequences(df, "nt", "doc_id", budget=256, partition="source")
    assert shuffle_count(packed) == 1  # one hash partition on source, no sort-

# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark plans"),
            (3, "quick brown fox jumps over nothing special here"),
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )


def test_contamination_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox jumps over everything")],
        ["doc_id", "text"],
    )
    rep = {r.doc_id: r for r in
           dc.contamination(_corpus(spark), bench, n=5).collect()}
    assert rep[1].contaminated and rep[1].n_overlap == 2
    # doc 3 shares 'quick brown fox jumps over' (5-gram) with the benchmark
    assert rep[3].contaminated and rep[3].n_overlap == 1
    assert not rep[2].contaminated and rep[2].n_overlap == 0
    assert rep[4].n_ngrams == 0 and not rep[4].contaminated


def test_decontaminate_drops_and_preserves_schema(spark):
    corpus = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over it")], ["doc_id", "text"])
    out = dc.decontaminate(corpus, bench, n=5)
    assert out.columns == corpus.columns
    # doc 1 shares 'the quick brown fox jumps'/'quick brown fox jumps over';
    # doc 3 shares the latter too — both must go
    assert {r.doc_id for r in out.collect()} == {2, 4}


def test_contamination_broadcasts_benchmark(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    plan = explain_str(dc.contamination(docs, bench, n=5))
    assert "BroadcastExchange" in plan


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",)], ["text"])
    row = df.select(tx.word_ngrams_expr("text", 3).alias("g")).first()
    assert row.g == []


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

def test_scrub_all_categories(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.org or call +1 555 0123 456, "
             "host 10.0.255.3, see https://x.io/p?q=1 end")],
        ["doc_id", "text"],
    )
    row = sc.scrub(df).first()
    assert row.text == ("mail <EMAIL> or call <PHONE>, host <IP>, "
                        "see <URL> end")
    assert (row.n_email, row.n_phone, row.n_ipv4, row.n_url) == (1, 1, 1, 1)


def test_scrub_url_wins_over_embedded_email(spark):
    df = spark.createDataFrame(
        [(1, "see https://x.io/mail/a@b.co now")], ["doc_id", "text"])
    row = sc.scrub(df).first()
    assert row.text == "see <URL> now"
    assert row.n_url == 1 and row.n_email == 0


def test_scrub_counts_multiple(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co c@d.org and 1.2.3.4 5.6.7.8")], ["doc_id", "text"])
    row = sc.scrub(df).first()
    assert row.n_email == 2 and row.n_ipv4 == 2
    assert row.text == "<EMAIL> <EMAIL> and <IP> <IP>"


def test_scrub_leaves_clean_text_alone(spark):
    df = spark.createDataFrame([(1, "nothing sensitive here")],
                               ["doc_id", "text"])
    row = sc.scrub(df).first()
    assert row.text == "nothing sensitive here"
    assert row.n_email == row.n_url == row.n_ipv4 == row.n_phone == 0


def test_scrub_no_shuffle_no_udf(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = explain_str(sc.scrub(docs))
    assert shuffle_count(sc.scrub(docs)) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Repetition stats
# ---------------------------------------------------------------------------

def test_dup_ngram_fraction(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "all words here differ"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.f for r in df.select(
        "doc_id", tx.dup_ngram_fraction_expr("text", 1).alias("f")).collect()}
    assert out[1] == pytest.approx(1 - 2 / 6)
    assert out[2] == 0.0
    assert out[3] is None


# ---------------------------------------------------------------------------
# Dataset split
# ---------------------------------------------------------------------------

def test_dataset_split_covers_all_rows_and_is_stable(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    a = {r.k: r.split for r in smp.dataset_split(df, "k", w, salt=11).collect()}
    b = {r.k: r.split for r in
         smp.dataset_split(df.repartition(17), "k", w, salt=11).collect()}
    assert a == b  # partition-invariant
    assert set(a.values()) <= {"train", "valid", "test"}
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in w}
    assert 0.77 < frac["train"] < 0.83
    assert 0.07 < frac["valid"] < 0.13
    assert 0.07 < frac["test"] < 0.13


def test_dataset_split_append_never_reassigns(spark):
    # the contract randomSplit can't give: growing the table leaves every
    # existing row's assignment untouched
    w = {"train": 0.5, "test": 0.5}
    small = spark.range(0, 1000).withColumnRenamed("id", "k")
    big = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k: r.split for r in smp.dataset_split(small, "k", w).collect()}
    b = {r.k: r.split for r in smp.dataset_split(big, "k", w).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_dataset_split_is_scan_stage(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    out = smp.dataset_split(df, "k", {"a": 0.5, "b": 0.5})
    assert shuffle_count(out) == 0


def test_dataset_split_rejects_bad_weights(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        smp.dataset_split(df, "k", {})
    with pytest.raises(ValueError):
        smp.dataset_split(df, "k", {"a": -0.1, "b": 1.1})
    with pytest.raises(ValueError):
        smp.dataset_split(df, "k", {"a": 0.0})


# ---------------------------------------------------------------------------
# Table profiling (operators/stats.py)
# ---------------------------------------------------------------------------

def test_profile_counts_nulls_and_distincts(spark):
    from carto_etl_spark.operators.stats import profile

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, None, 5.0), (4, "b", None)],
        "id long, name string, score double",
    )
    out = {r.col_name: r for r in profile(df).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["id"].n_distinct == 4
    assert (out["id"].min_value, out["id"].max_value) == ("1", "4")
    assert out["name"].n_nulls == 1 and out["name"].n_distinct == 2
    assert out["score"].n_nulls == 2 and out["score"].n_distinct == 1
    assert out["score"].min_value == "5.0"


def test_profile_is_single_scan(spark):
    from carto_etl_spark.operators.stats import profile
    from carto_etl_spark.plans.inspect import explain_str

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = explain_str(profile(docs, ["doc_id", "lang", "source"]))
    # one pass over the bytes no matter how many columns are profiled
    # (the formatted plan mentions each node once in the tree and once in
    # the details section)
    assert plan.count("+- Scan parquet") == 1


# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------

def _chunk_rows(spark, texts, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    return tx.chunk_documents(df, "text", ["doc_id"], **kw).collect()


def test_chunk_short_doc_is_one_chunk(spark):
    rows = _chunk_rows(spark, ["a b c"], window=4, stride=2)
    assert len(rows) == 1
    assert rows[0]["chunk_idx"] == 0
    assert rows[0]["chunk_text"] == "a b c"
    assert rows[0]["chunk_tokens"] == 3


def test_chunk_exact_window_boundary(spark):
    # n == window -> exactly one chunk, no redundant tail
    rows = _chunk_rows(spark, ["a b c d"], window=4, stride=2)
    assert len(rows) == 1


def test_chunk_overlap_and_tail_coverage(spark):
    toks = [f"t{i}" for i in range(10)]
    rows = _chunk_rows(spark, [" ".join(toks)], window=4, stride=3)
    # starts 0,3,6 cover t0..t9; 1 + ceil((10-4)/3) = 3 chunks
    assert [r["chunk_idx"] for r in sorted(rows, key=lambda r: r["chunk_idx"])] == [0, 1, 2]
    chunks = {r["chunk_idx"]: r["chunk_text"].split() for r in rows}
    assert chunks[0] == ["t0", "t1", "t2", "t3"]
    assert chunks[1] == ["t3", "t4", "t5", "t6"]
    assert chunks[2] == ["t6", "t7", "t8", "t9"]
    # every token appears in some chunk
    assert set(toks) == {t for c in chunks.values() for t in c}


def test_chunk_blank_docs_dropped_and_whitespace_collapsed(spark):
    rows = _chunk_rows(spark, ["", "   ", "a  \t b"], window=4, stride=2)
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b"


def test_chunk_rejects_gapping_stride(spark):
    df = None
    with pytest.raises(ValueError):
        tx.chunk_documents(df, "text", window=4, stride=5)


def test_chunk_is_map_side_only(spark):
    from carto_etl_spark.plans.inspect import explain_str

    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    plan = explain_str(tx.chunk_documents(df, "text", ["doc_id"]))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Weighted systematic sampling (distributed prefix sum)
# ---------------------------------------------------------------------------

def test_running_weight_matches_serial_prefix_sum(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
    )
    out, total = smp.with_running_weight(df.repartition(8), "w", "k")
    rows = sorted((r["k"], r["cum_weight"]) for r in out.collect())
    expect, run = [], 0
    for k in range(1000):
        expect.append((k, run))
        run += k % 7 + 1
    assert rows == expect and total == run


def test_weighted_sample_pick_count_is_exact(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 13 + 1).alias("w")
    )
    for k in (1, 7, 100, 499):
        out = smp.weighted_systematic_sample(df, "w", k, "k")
        assert out.agg(F.sum("n_picks")).collect()[0][0] == k


def test_weighted_sample_heavy_row_multiplicity(spark):
    # one row carries ~all the weight -> it takes nearly every threshold
    df = spark.createDataFrame([(1, 1), (2, 10_000), (3, 1)], "k long, w long")
    out = {r["k"]: r["n_picks"] for r in
           smp.weighted_systematic_sample(df, "w", 10, "k").collect()}
    assert out.get(2, 0) >= 9
    assert sum(out.values()) == 10


def test_weighted_sample_partition_invariant_and_deterministic(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 31 + 1).alias("w")
    )
    a = sorted((r["k"], r["n_picks"]) for r in
               smp.weighted_systematic_sample(df, "w", 50, "k").collect())
    b = sorted((r["k"], r["n_picks"]) for r in
               smp.weighted_systematic_sample(df.repartition(17), "w", 50, "k").collect())
    assert a == b and len(a) > 0


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 5)], "k long, w long"
    )
    out = smp.weighted_systematic_sample(df, "w", 4, "k")
    ks = {r["k"] for r in out.collect()}
    assert ks <= {1, 5} and sum(r["n_picks"] for r in out.collect()) == 4
    import pytest as _pt
    with _pt.raises(ValueError):
        smp.weighted_systematic_sample(df, "w", 0, "k")


def test_weighted_sample_proportionality(spark):
    # k large relative to n: picks approximate weight share within +-1
    df = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 600)], "k long, w long"
    )
    out = {r["k"]: r["n_picks"] for r in
           smp.weighted_systematic_sample(df, "w", 100, "k").collect()}
    assert abs(out.get(1, 0) - 10) <= 1
    assert abs(out.get(2, 0) - 30) <= 1
    assert abs(out.get(3, 0) - 60) <= 1


# ---------------------------------------------------------------------------
# Complete-bin histogram
# ---------------------------------------------------------------------------

def test_histogram_complete_bins_and_edges(spark):
    from carto_etl_spark.operators.stats import histogram

    df = spark.createDataFrame(
        [(0.0,), (4.9,), (5.0,), (10.0,), (-0.1,), (10.1,), (None,)],
        "x double",
    )
    out = {r["bin"]: r for r in histogram(df, "x", 0.0, 10.0, 2).collect()}
    assert len(out) == 2
    assert out[0]["n"] == 2          # 0.0, 4.9
    assert out[1]["n"] == 2          # 5.0, and 10.0 joins the CLOSED top bin
    assert (out[0]["bin_lo"], out[0]["bin_hi"]) == (0.0, 5.0)
    # -0.1, 10.1, NULL excluded


def test_histogram_empty_bins_emit_zero(spark):
    from carto_etl_spark.operators.stats import histogram

    df = spark.createDataFrame([(0.5,), (9.5,)], "x double")
    out = {r["bin"]: r["n"] for r in histogram(df, "x", 0.0, 10.0, 10).collect()}
    assert len(out) == 10 and out[0] == 1 and out[9] == 1
    assert all(out[i] == 0 for i in range(1, 9))


def test_histogram_validation(spark):
    import pytest as _pt
    from carto_etl_spark.operators.stats import histogram

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pt.raises(ValueError):
        histogram(df, "x", 0.0, 10.0, 0)
    with _pt.raises(ValueError):
        histogram(df, "x", 10.0, 10.0, 5)


def test_temperature_mixture_null_sources_excluded(spark):
    # NULL source rows must neither crash the plan derivation (sorted() over
    # a None/str mix) nor appear in the output — epoch_plan's NULL policy
    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else None))
            for i in range(3000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = smp.temperature_mixture(df, "k", "lang", target_fraction=0.5)
    got = out.collect()
    assert all(r["lang"] is not None for r in got)
    assert 0 < len(got) < 2000  # sampled from the 2000 non-null rows only


# ---------------------------------------------------------------------------
# End-to-end preprocessing composition (pipeline_e2e)
# ---------------------------------------------------------------------------

def test_pipeline_e2e_planted_fates(spark):
    """The composition must drop exactly what each stage plants: boilerplate
    lines never reach the output text, planted near-copies lose to their
    source (min-id survivorship), and every emitted row carries a valid
    split and shard."""
    from carto_etl_spark.queries import q_pipeline_e2e

    rows = q_pipeline_e2e(spark, SF).collect()
    assert rows
    ids = {r["doc_id"] for r in rows}
    # near-copies (id + 10^6) are near-dups of their source at Jaccard >> .5
    # (one extra trailing token): the min-id rule keeps only the source
    assert not any(i >= 1_000_000 for i in ids)
    for r in rows:
        assert r["split"] in ("train", "valid", "test")
        assert 0 <= r["shard"] < 16
        assert r["n_tokens"] >= 3  # the quality gate's floor


def test_pipeline_e2e_downstream_never_rescans_corpus(spark):
    """The composition materializes the cleaned+scrubbed frame once
    (localCheckpoint) before minhash: without that boundary the five
    minhash plan branches each re-derived the whole prefix — 8 corpus
    scans (measured).  The final plan must read the corpus parquet ZERO
    times past the boundary."""
    from carto_etl_spark.queries import q_pipeline_e2e

    plan = explain_str(q_pipeline_e2e(spark, SF))
    scans = plan.count("documents.parquet")
    assert scans == 0, f"composition re-scans the corpus: {scans}"


def test_pipeline_ccnet_gate_composition(spark):
    """pipeline_ccnet = pipeline_e2e with the TRAINED classifier gate
    between scrub and near-dedup: its survivors must be a SUBSET of
    pipeline_e2e's (the gate only removes), strictly smaller on this
    corpus (the gate actually fires), manifest invariants hold, and the
    scan-count pin survives the extra stage (training collects before the
    boundary; the final plan reads the corpus parquet zero times)."""
    from carto_etl_spark.queries import q_pipeline_ccnet, q_pipeline_e2e

    base_ids = {r["doc_id"] for r in q_pipeline_e2e(spark, SF).collect()}
    df = q_pipeline_ccnet(spark, SF)
    rows = df.collect()
    assert rows
    ids = {r["doc_id"] for r in rows}
    # Not a strict subset in principle (dropping a dedup-component's
    # min-id can promote a survivor), but planted near-copies must still
    # lose and manifest invariants must hold
    assert not any(i >= 1_000_000 for i in ids)
    assert len(ids) < len(base_ids)  # the gate fires on this corpus
    for r in rows:
        assert r["split"] in ("train", "valid", "test")
        assert 0 <= r["shard"] < 16
    plan = explain_str(df)
    scans = plan.count("documents.parquet")
    assert scans == 0, f"ccnet composition re-scans the corpus: {scans}"


def test_pipeline_fineweb_stage_fates(spark):
    """pipeline_fineweb plants one fate per stage: cookie-banner and footer
    lines die at the C4 LINE rule (no cross-doc line dedup in this chain),
    short docs die at the page sentence bound, repetitive docs die at the
    Gopher gate, near-copies (id + 10^6) lose min-id survivorship at
    near-dedup, and the manifest invariants hold.  The double
    materialization boundary (c4kept, gated) must leave the final plan
    reading the corpus parquet zero times."""
    from carto_etl_spark.queries import q_pipeline_fineweb

    df = q_pipeline_fineweb(spark, SF)
    rows = df.collect()
    assert rows
    ids = {r["doc_id"] for r in rows}
    # A near-copy may survive as an ORPHAN: its extra terminal-punct line
    # can carry a 4-sentence source over the C4 page bound the source
    # itself failed.  What can never happen is copy AND source both
    # surviving — if the source is in the output, the copy near-dups it
    # and loses min-id survivorship.
    both = {i for i in ids if i >= 1_000_000 and i - 1_000_000 in ids}
    assert not both, f"copy+source pairs survived dedup: {sorted(both)[:5]}"
    for r in rows:
        assert r["split"] in ("train", "valid", "test")
        assert 0 <= r["shard"] < 16
        # C4 kept lines have >= 3 words, pages have >= 5 sentences
        assert r["n_tokens"] >= 3
    plan = explain_str(df)
    scans = plan.count("documents.parquet")
    assert scans == 0, f"fineweb composition re-scans the corpus: {scans}"
