"""Unicode normalization for corpus pipelines: NFC / NFKC forms and a
case-accent fold key.

Not in the reference (its string surface is strip/lower/replace,
/root/reference/etl/etl.py:70-83); a north-star training-data operator —
text dedup is wrong without it (``e`` + COMBINING ACUTE and precomposed
``é`` are different byte strings for the same text; ligatures and
fullwidth forms likewise), so corpus pipelines canonicalize before any
fingerprinting.

This is the justified-UDF case: Spark has no built-in Unicode
normalization (java.text.Normalizer is not exposed as a SQL function), so
the three forms come from ONE Arrow-batched pandas UDF over stdlib
``unicodedata`` — one Python round-trip per batch producing a struct, never
one per form, and zero shuffles (plan-gated).  The fold key is
NFKD → strip combining marks → ``str.casefold`` (full case folding:
``ß`` → ``ss``, which ``lower()`` does not do).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_STRUCT = "nfc string, nfkc string, folded string"


def _fold(s: str) -> str:
    decomposed = unicodedata.normalize("NFKD", s)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return stripped.casefold()


def _make_udf():
    # built lazily: pandas_udf parses the DDL return type through the active
    # session, so decorating at import time would require one to exist
    @pandas_udf(_STRUCT)
    def _normalize_udf(texts: pd.Series) -> pd.DataFrame:
        nfc, nfkc, folded = [], [], []
        for s in texts:
            if s is None:
                nfc.append(None), nfkc.append(None), folded.append(None)
            else:
                nfc.append(unicodedata.normalize("NFC", s))
                nfkc.append(unicodedata.normalize("NFKC", s))
                folded.append(_fold(s))
        return pd.DataFrame({"nfc": nfc, "nfkc": nfkc, "folded": folded})

    return _normalize_udf


def normalized_struct(text: Column | str) -> Column:
    """struct<nfc, nfkc, folded> for a text column — one Arrow transfer."""
    return _make_udf()(text if isinstance(text, Column) else F.col(text))


def with_normalized(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``nfc`` / ``nfkc`` / ``fold_key`` columns.  The struct is
    produced once and unpacked by projection, so the UDF runs one pass;
    no exchange anywhere — rides the scan like any map-only stage."""
    s = normalized_struct(text_col).alias("__norm")
    staged = df.select("*", s)
    return staged.select(
        *df.columns,
        F.col("__norm.nfc").alias("nfc"),
        F.col("__norm.nfkc").alias("nfkc"),
        F.col("__norm.folded").alias("fold_key"),
    )
