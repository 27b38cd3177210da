"""Text-analysis operators for training-data pipelines: token counting, quality
scoring, language ID, and document fingerprinting.

Not in the reference (its only string ops are strip/lower/replace,
/root/reference/etl/etl.py:70-83,233-234); mandated by the engine's north star
as first-class 100 TB-scale operators.  Everything is built from
`pyspark.sql.functions` — string/regex/array expressions inside whole-stage
codegen; no Python UDFs.  Each operator has a deliberately portable definition
(same regexes/arithmetic expressible in ANSI SQL) so the duckdb oracle can
verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# ---------------------------------------------------------------------------
# Tokenization + counting
# ---------------------------------------------------------------------------

def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokens; empty/blank text -> empty array (split would give
    [''] — filtered out to keep counts honest)."""
    t = _col(text)
    return F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")


def token_count_expr(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens_expr(text))


def word_ngrams_expr(
    text: Column | str, n: int, *, pretokenized: bool = False
) -> Column:
    """Array of space-joined word n-grams over whitespace tokens (empty array
    when the document has fewer than ``n`` tokens).  Pure JVM array
    expressions — tokens → sliding slice → concat_ws.

    ``pretokenized=True`` treats ``text`` as an already-tokenized
    ``array<string>`` column: stage the tokens in their own projection when
    the consumer references the gram array more than once — CollapseProject
    re-inlines cheap aliases but keeps multiply-referenced non-cheap ones, so
    staging is what stops the tokenize+gram chain being built once per
    reference (measured 31x on the repetition query at sf0.1)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = _col(text) if pretokenized else tokens_expr(text)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def dup_ngram_fraction_expr(text: Column | str, n: int) -> Column:
    """Within-document repetitiveness (Gopher-style repetition filter):
    fraction of word n-gram OCCURRENCES whose n-gram also occurs elsewhere in
    the same document, ``1 - distinct/total``; NULL when the document has no
    n-grams.  Pure array arithmetic — no shuffle, no UDF; heavily boilerplated
    documents score near 1, natural text near 0."""
    grams = word_ngrams_expr(text, n)
    total = F.size(grams)
    return F.lit(1.0) - F.size(F.array_distinct(grams)) / F.nullif(
        total.cast("double"), F.lit(0.0)
    )


#: BPE-ish lexer: word pieces or single non-space punctuation — the classic
#: pre-tokenization regex shape used by BPE vocabularies.
BPE_TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def bpe_token_count_expr(text: Column | str) -> Column:
    """Count of BPE-style pre-tokens (words + standalone punctuation)."""
    return F.regexp_count(_col(text), F.lit(BPE_TOKEN_PATTERN))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

#: Tiny function-word list for quality scoring (public stop-word canon).
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that", "are",
)

PUNCT_PATTERN = r"[.,;:!?]"


def stopword_ratio_expr(text: Column | str) -> Column:
    """Fraction of whitespace tokens that are stopwords (lowercased exact
    match); NULL for token-less text."""
    toks = tokens_expr(text)
    stops = F.array(*[F.lit(w) for w in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    return hits / F.nullif(F.size(toks), F.lit(0))


def punct_ratio_expr(text: Column | str) -> Column:
    """Sentence-punctuation chars per character; NULL for empty text."""
    t = _col(text)
    return F.regexp_count(t, F.lit(PUNCT_PATTERN)) / F.nullif(
        F.length(t), F.lit(0)
    )


def mean_word_length_expr(text: Column | str) -> Column:
    toks = tokens_expr(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return total / F.nullif(F.size(toks), F.lit(0))


def quality_score_expr(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot, sane word length,
    some-but-not-too-much punctuation, stopword presence.  A deterministic
    arithmetic blend — the point is the *shape* (pluggable per corpus), each
    component is a documented public heuristic (C4/Gopher-style filters)."""
    t = _col(text)
    n_chars = F.length(t)
    length_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    mwl = mean_word_length_expr(t)
    word_score = F.when(
        mwl.isNull(), F.lit(0.0)
    ).otherwise(
        F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    )
    stop = F.coalesce(stopword_ratio_expr(t), F.lit(0.0))
    stop_score = F.when(stop > 0.05, F.lit(1.0)).otherwise(stop * 20.0)
    punct = F.coalesce(punct_ratio_expr(t), F.lit(0.0))
    punct_score = F.when(punct <= 0.1, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), F.lit(1.0) - (punct - 0.1) * 5.0)
    )
    return (
        length_score * 0.3 + word_score * 0.2 + stop_score * 0.3 + punct_score * 0.2
    )


# ---------------------------------------------------------------------------
# Language identification (marker-word heuristic)
# ---------------------------------------------------------------------------

#: Small high-frequency marker sets per language (public function-word lists).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "los", "que", "con"),
    "de": ("der", "die", "und", "ist", "mit"),
    "fr": ("le", "la", "les", "est", "avec"),
}


def lang_scores_expr(text: Column | str) -> dict[str, Column]:
    toks = tokens_expr(text)
    out = {}
    for lang, words in LANG_MARKERS.items():
        markers = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(markers, F.lower(t)))
        )
    return out


def lang_id_expr(text: Column | str) -> Column:
    """argmax over marker-hit counts; ties broken by language-code order;
    'und' (undetermined) when nothing hits."""
    scores = lang_scores_expr(text)
    langs = sorted(scores)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # earlier langs win ties by overwriting later
        s = scores[lang]
        best_lang = F.when((s >= 1) & (s >= best_score), F.lit(lang)).otherwise(
            best_lang
        )
        best_score = F.greatest(best_score, s)
    return best_lang


_compression_udf = None


def compression_ratio_expr(text: Column | str, min_bytes: int = 0) -> Column:
    """zlib compressed-size / raw-size (Gopher-style repetitiveness filter:
    boilerplate and repeated text compresses far below ~0.4).  Arrow-batched
    pandas UDF — stdlib zlib, deterministic; NULL for empty text.

    ``min_bytes``: texts shorter than this yield NULL instead of a ratio —
    below a few dozen bytes the zlib header dominates (ratios > 1) and the
    signal says nothing about repetitiveness, so quality pipelines should
    treat short docs as "no evidence" rather than "not repetitive"."""
    global _compression_udf
    if _compression_udf is None:
        import zlib

        def ratio(s):
            return s.map(
                lambda t: (
                    len(zlib.compress(t.encode("utf-8"))) / len(t.encode("utf-8"))
                    if t
                    else None
                )
            )

        _compression_udf = F.pandas_udf(ratio, "double")
    out = _compression_udf(_col(text))
    if min_bytes > 0:
        out = F.when(
            F.octet_length(_col(text)) >= min_bytes, out
        )
    return out


_compressed_len_udf = None


def compressed_len_expr(text: Column | str) -> Column:
    """zlib compressed byte length of the UTF-8 text (NULL for empty text).

    The integer form of ``compression_ratio_expr``: emitting exact byte
    counts instead of a double ratio makes the signal oracle-checkable with
    no FP rounding concerns (ratio = compressed_len / octet_length for the
    reader).  Same Arrow-batched pandas UDF shape, stdlib zlib (level 6
    default), deterministic."""
    global _compressed_len_udf
    if _compressed_len_udf is None:
        import zlib

        def clen(s):
            return s.map(
                lambda t: len(zlib.compress(t.encode("utf-8"))) if t else None
            )

        _compressed_len_udf = F.pandas_udf(clen, "long")
    return _compressed_len_udf(_col(text))


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

def normalize_text_expr(text: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def fingerprint_expr(text: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the normalized text (portable —
    identical in any engine with md5)."""
    return F.md5(normalize_text_expr(text))


def shingle_fingerprint_expr(
    text: Column | str, k: int = 8, n_min: int = 4, *, prenormalized: bool = False
) -> Column:
    """Near-dup fingerprint via a bottom-k sketch of character k-gram hashes
    over the normalized text (a winnowing-style rolling fingerprint: two
    documents sharing most k-grams share most of the sketch).  Pure array
    expressions: positions -> substrings -> md5 -> sorted bottom-n_min.

    PERFORMANCE: the lambda below references the normalized text once per
    shingle; if that operand is the normalize regex itself, it re-runs per
    shingle (no CSE inside lambda bodies).  Project the normalized text into
    its own column first and pass ``prenormalized=True`` — done by callers in
    queries.py."""
    norm = _col(text) if prenormalized else normalize_text_expr(text)
    n_shingles = F.greatest(F.length(norm) - (k - 1), F.lit(0))
    positions = F.sequence(F.lit(1), F.greatest(n_shingles, F.lit(1)))
    hashes = F.when(n_shingles <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(positions, lambda i: F.md5(norm.substr(i, F.lit(k))))
    )
    return F.slice(F.array_sort(hashes), 1, n_min)


# ---------------------------------------------------------------------------
# TF-IDF distinctive terms
# ---------------------------------------------------------------------------

def doc_term_freqs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (doc, term) with the term's in-document occurrence count.
    Terms are lower-cased whitespace tokens.  The explode shuffles on
    (doc, term) with map-side partial aggregation, so a term repeated a
    thousand times in one document ships one row per partition."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("term")
    )
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` most distinctive terms per document, ranked by
    ``tf / (1 + df)`` — term frequency weighted by LINEAR inverse document
    frequency.  The ranking is order-equivalent to classic tf·idf with
    ``idf = N/(1+df)`` (N is a per-corpus constant, and x ↦ x is monotone);
    the log-idf variant is deliberately NOT used for the score column because
    JVM ``Math.log`` and C libm disagree in the last ulp on ~8% of inputs
    (measured 393/5000 here), which breaks bit-exact cross-engine
    verification, while a single IEEE division is exactly rounded everywhere.
    Consumers wanting log-scaled scores can recompute from the emitted
    integer ``tf``/``df``.

    Shuffle plan: (doc, term) partial-agg groupBy → per-term df aggregate
    (vocabulary-sized) → term-keyed join back → per-doc top-k window.  No
    driver state, no UDFs.
    """
    tf = doc_term_freqs(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf") / (F.lit(1.0) + F.col("df"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(id_col, "term", "tf", "df", "score")
    )


# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap — the
    context-window chunking step every pretraining/RAG pipeline runs before
    embedding or packing.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + window)``; the chunk
    count is ``1 + ceil((n - window)/stride)`` (one chunk when ``n <=
    window``), so the tail never emits a window that the previous one already
    fully covers.  Everything is array arithmetic on the whitespace
    tokenization — ``sequence`` + ``explode`` + ``slice`` inside whole-stage
    codegen, no UDF and no shuffle: chunking is a map-side operation whatever
    the corpus size, and downstream repartitioning is the caller's choice.

    Emits one row per chunk: id columns, ``chunk_idx``, ``chunk_text``, and
    ``chunk_tokens`` (tail chunks may be shorter than ``window``).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError("stride > window would drop tokens between chunks")
    ids = id_cols or ["doc_id"]
    toks = tokens_expr(text_col)
    staged = (
        df.withColumn("__toks", toks)
        .withColumn("__n_tok", F.size(F.col("__toks")))
        .where(F.col("__n_tok") > 0)
        .withColumn(
            "__n_chunks",
            F.when(F.col("__n_tok") <= window, F.lit(1)).otherwise(
                F.lit(1)
                + F.expr(f"(__n_tok - {window} + {stride - 1}) div {stride}")
            ),
        )
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)),
        )
    )
    piece = F.expr(f"slice(__toks, chunk_idx * {stride} + 1, {window})")
    return staged.select(
        *ids,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("chunk_tokens"),
    )


def hashed_features(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    dim: int = 64,
    ngram: int = 1,
) -> DataFrame:
    """Feature-hashing (hashing-trick) bag-of-words: each whitespace token
    is bucketed by the first 8 hex digits of its md5, mod ``dim``, and
    per-document bucket counts come back SPARSE as (*id_cols, feature,
    count) rows — the layout a training pipeline feeds to a vector
    assembler, and the honest distributed representation (dense arrays
    assemble downstream, per consumer).

    md5-prefix bucketing is deliberate: both Spark and any SQL oracle
    render md5 as the same hex string, so the bucket assignment is
    engine-reproducible (unlike xxhash64/murmur, which have no SQL twin).
    Plan shape: explode tokens -> hash -> groupBy(ids, feature) with
    map-side partial aggregation; shuffle volume is the distinct
    (doc, bucket) pair count, capped at rows * dim.

    ``ngram=2`` ADDS word-bigram features ("a b" joined with one space)
    to the unigrams — the fastText convention (Joulin et al. 2016,
    arXiv:1607.01759 §2: bag of words + bag of n-grams, one shared
    hashing space).  Same bucket function, so the classifier and the
    unrolled training oracle work unchanged; explode volume grows to
    ~2n-1 tokens per doc.
    """
    toks = tokens_expr(F.col(text_col))
    if ngram == 1:
        tok_arr = toks
    elif ngram == 2:
        n1 = F.greatest(F.size(toks) - 1, F.lit(0))
        bi = F.zip_with(
            F.slice(toks, F.lit(1), n1),
            F.slice(toks, F.lit(2), n1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        tok_arr = F.concat(toks, bi)
    else:
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    tok = F.explode(tok_arr).alias("__tok")
    bucket = (
        F.conv(F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10)
        .cast("long")
        % dim
    ).cast("int")
    return (
        df.select(*id_cols, tok)
        .select(*id_cols, bucket.alias("feature"))
        .groupBy(*id_cols, "feature")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def hashed_features_oracle_sql(
    rows_sql: str, id_cols: list[str], dim: int = 64, ngram: int = 1
) -> str:
    """Mirror of `hashed_features` for DuckDB: ``rows_sql`` must yield the
    id columns plus a ``text`` column; tokens split on whitespace with
    blanks dropped, bucket = ('0x' || first 8 md5 hex chars) % dim.
    ``ngram=2`` appends space-joined word bigrams, matching the operator."""
    ids = ", ".join(id_cols)
    base = (
        "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"
    )
    if ngram == 1:
        arr = "t"
    elif ngram == 2:
        arr = (
            f"list_concat(t, list_transform(range(1, greatest(len(t), 1)), "
            "i -> t[i] || ' ' || t[i+1]))"
        )
    else:
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    return f"""
WITH base AS (
  SELECT {ids}, {base} AS t FROM ({rows_sql}) r
), toks AS (
  SELECT {ids}, unnest({arr}) AS tok FROM base
)
SELECT {ids},
       CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {dim}
            AS INT) AS feature,
       CAST(count(*) AS BIGINT) AS count
FROM toks GROUP BY {ids}, feature
"""


def doc_bigrams(
    df: DataFrame, text_col: str, id_cols: list[str]
) -> DataFrame:
    """One row per (ids, w1, w2) token bigram, whitespace tokens.  Docs
    with < 2 tokens produce no rows."""
    t = df.select(*id_cols, tokens_expr(F.col(text_col)).alias("__toks"))
    t = t.where(F.size("__toks") >= 2)
    return t.select(
        *id_cols,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - 2),
                lambda i: F.struct(
                    F.element_at("__toks", i + 1).alias("w1"),
                    F.element_at("__toks", i + 2).alias("w2"),
                ),
            )
        ).alias("__bg"),
    ).select(*id_cols, "__bg.w1", "__bg.w2")


def bigram_lm_scores(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model fluency scoring: train an add-one-smoothed
    bigram model on ``train`` (exact integer counts), then score each
    ``score`` document by its mean bigram surprisal -log2 p(w2|w1) — low =
    fluent under the reference corpus, high = gibberish / boilerplate /
    wrong domain.  The standard corpus-quality gate (CCNet filters on KenLM
    perplexity; a bigram model is its two-gram core, trained with one
    groupBy instead of a native library).

    Determinism contract: p = (c(w1,w2)+1)/(c(w1)+V) is one double
    division; its log2 is the ONLY libm call, and each bigram's surprisal
    is rounded to 6dp and decimal-cast BEFORE the per-doc sum (the
    trajectory_length pattern), so the aggregate is associative,
    partition-order-proof, and engine-reproducible — last-ulp libm
    disagreement is absorbed per term, never accumulated.  Unseen w1
    contexts score the OOV floor -log2(1/V).

    Scale: training is two partial-agg groupBys over the train corpus
    (shuffle bounded by vocab/bigram-type counts); scoring joins the score
    corpus's bigrams against the count tables on their natural keys —
    plain shuffle hash joins that AQE skew-splits on hot words.
    """
    train_bg = doc_bigrams(train, text_col, [id_col])
    big_counts = train_bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("__c2")
    )
    uni_counts = big_counts.groupBy("w1").agg(
        F.sum("__c2").alias("__c1")
    )
    vocab = train_bg.select(F.col("w2").alias("w")).union(
        train_bg.select(F.col("w1"))
    ).distinct().count()

    sbg = doc_bigrams(score, text_col, [id_col])
    joined = sbg.join(big_counts, ["w1", "w2"], "left").join(
        uni_counts, "w1", "left"
    )
    p = (F.coalesce(F.col("__c2"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("__c1"), F.lit(0)) + vocab
    ).cast("double")
    surprisal = F.round(-F.log2(p), 6).cast("decimal(20,6)")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(surprisal).cast("decimal(28,6)").alias("total_surprisal"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        "total_surprisal",
        (
            F.col("total_surprisal").cast("double")
            / F.col("n_bigrams").cast("double")
        ).alias("mean_surprisal"),
    )


def bigram_lm_oracle_sql(
    train_sql: str, score_sql: str, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of ``bigram_lm_scores``; ``train_sql``/``score_sql``
    must yield (id, text).  Same per-term 6dp rounding before the exact
    decimal sum."""
    return f"""
WITH train_toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')
           AS tk
  FROM ({train_sql}) tr
), train_bg AS (
  SELECT tk[i+1] AS w1, tk[i+2] AS w2
  FROM train_toks, unnest(range(0, greatest(len(tk) - 1, 0))) AS t(i)
), big_counts AS (
  SELECT w1, w2, count(*) AS c2 FROM train_bg GROUP BY w1, w2
), uni_counts AS (
  SELECT w1, sum(c2) AS c1 FROM big_counts GROUP BY w1
), vocab AS (
  SELECT count(*) AS v FROM (
    SELECT w2 AS w FROM train_bg UNION SELECT w1 FROM train_bg
  )
), score_toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')
           AS tk
  FROM ({score_sql}) sc
), score_bg AS (
  SELECT {id_col}, tk[i+1] AS w1, tk[i+2] AS w2
  FROM score_toks, unnest(range(0, greatest(len(tk) - 1, 0))) AS t(i)
), terms AS (
  SELECT s.{id_col},
         CAST(round(-log2(
             CAST(coalesce(b.c2, 0) + 1 AS DOUBLE)
             / CAST(coalesce(u.c1, 0) + vocab.v AS DOUBLE)
         ), 6) AS DECIMAL(20,6)) AS surprisal
  FROM score_bg s
  LEFT JOIN big_counts b ON s.w1 = b.w1 AND s.w2 = b.w2
  LEFT JOIN uni_counts u ON s.w1 = u.w1
  CROSS JOIN vocab
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(surprisal) AS DECIMAL(28,6)) AS total_surprisal,
       CAST(sum(surprisal) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS mean_surprisal
FROM terms GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# TextRank keyword extraction (co-occurrence graph -> PageRank)
# ---------------------------------------------------------------------------

def cooccurrence_edges(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Undirected adjacent-word co-occurrence graph ``(src, dst, w)`` — the
    edge table of TextRank (Mihalcea & Tarau 2004, window = 2): keyword
    salience is PageRank over this graph (operators/graph.py supplies the
    exact-integer iterations).

    One corpus scan: words come from the same engine-portable tokenization
    as BPE training (``[a-z]+`` after ``lower``), adjacent pairs are a
    scan-stage ``zip_with`` over the word array (no explode of positions
    into a shuffle — the pair list stays inside the row until the count
    aggregate), self-loops are dropped, and the count aggregate is
    map-side combined so the exchange carries distinct ordered pairs, not
    corpus positions.  Symmetrization mirrors the counted pairs (two rows
    per distinct pair) and re-aggregates — both shuffles are vocabulary²-
    bounded, never corpus-bounded."""
    w = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    adj = F.when(
        F.size(w) < 2,
        F.array().cast("array<struct<w1:string,w2:string>>"),
    ).otherwise(
        F.zip_with(
            F.slice(w, F.lit(1), F.size(w) - 1),
            F.slice(w, F.lit(2), F.size(w) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
    )
    pairs = (
        df.select(F.explode(adj).alias("p"))
        .select("p.w1", "p.w2")
        .where(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mirrored = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("w1").alias("src"),
                    F.col("w2").alias("dst"),
                    F.col("c"),
                ),
                F.struct(
                    F.col("w2").alias("src"),
                    F.col("w1").alias("dst"),
                    F.col("c"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    return mirrored.groupBy("src", "dst").agg(F.sum("c").alias("w"))


def cooccurrence_edges_sql(source_sql: str, text_col: str = "text") -> str:
    """DuckDB twin of ``cooccurrence_edges`` (kept beside it so the two
    cannot drift): same tokenization, same self-loop rule, same
    mirror-then-sum symmetrization."""
    toks = f"regexp_extract_all(lower({text_col}), '[a-z]+')"
    return f"""
SELECT e.src AS src, e.dst AS dst, CAST(sum(e.c) AS BIGINT) AS w FROM (
  SELECT unnest([
           {{'src': w1, 'dst': w2, 'c': c}},
           {{'src': w2, 'dst': w1, 'c': c}}
         ]) AS e
  FROM (
    SELECT a[i] AS w1, a[i + 1] AS w2, count(*) AS c FROM (
      SELECT {toks} AS a,
             unnest(generate_series(1, len({toks}) - 1)) AS i
      FROM ({source_sql}))
    WHERE a[i] != a[i + 1]
    GROUP BY 1, 2)
) GROUP BY 1, 2
"""
