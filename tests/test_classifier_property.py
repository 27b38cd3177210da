"""Property test for the quality-gate score paths: for ARBITRARY unicode
text (including exotic whitespace, combining marks, emoji, control chars),
the scan-stage expression (`quality_score_expr`), the Arrow twin
(`quality_scores_arrow`), and a direct Python model of the contract
(Java-\\s tokenization -> md5-prefix bucket -> integer sum -> truncating
hard sigmoid) must agree EXACTLY — the bit-identity the classifier's
dispatch freedom rests on.

One hypothesis case generates a whole batch of documents evaluated in a
single DataFrame pass (per-example Spark jobs would be prohibitively slow).
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import given, settings, strategies as st

from carto_etl_spark.operators import classifier as clf

DIM = 16
W = [((-1) ** i) * (i * 37 + 5) for i in range(DIM)]
BIAS = -1234
SCALE = 10**6
_SPLIT = re.compile("[ \t\n\x0b\f\r]+").split


def model_score(text: str | None) -> int:
    tot = BIAS
    if text is not None:
        for tok in _SPLIT(text):
            if tok:
                h = int(
                    hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16
                )
                tot += W[h % DIM]
    return max(0, min(SCALE, clf._tdiv(tot, 4) + SCALE // 2))


# text drawn from full unicode minus surrogates (Spark rejects lone
# surrogates in UTF-8), plus targeted whitespace-rich alphabets
_texts = st.one_of(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FFFF
        ),
        max_size=60,
    ),
    st.text(alphabet=" \t\n\x0b\f\r\xa0 abé\U0001f600", max_size=40),
    st.none(),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=40))
def test_gate_paths_match_python_model(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    via_expr = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            clf.quality_score_expr("text", W, BIAS, scale=SCALE).alias("s"),
        ).collect()
    }
    via_arrow = {
        r["doc_id"]: r["score_scaled"]
        for r in clf.quality_scores_arrow(
            df, "text", W, BIAS, scale=SCALE
        ).collect()
    }
    want = {i: model_score(t) for i, t in enumerate(docs)}
    assert via_expr == want
    assert via_arrow == want


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
