"""Byte-budgeted driver-side Arrow probes for tiered operators.

Several operators run a driver tier below some size threshold (union-find
/ numpy components in dedup.py, the integer loops in graph.py, classifier
GD): each probes ``df.limit(cap + 1)`` onto the driver and falls back to
the distributed tier when the cap is exceeded.  Row caps alone are the
wrong unit (r8 verdict #7): 50M int64 edge PAIRS are ~800 MB over Arrow —
fine under the default 4g ``spark.driver.maxResultSize`` — but the same
row count of string keys or wide rows sails past it and the job dies in
the transfer, exactly the failure the tier exists to avoid.

`arrow_probe` sizes the probe in BYTES FROM THE ARROW TABLE: a small
sample establishes bytes/row, the row allowance is clamped to a budget
derived from the session's live ``maxResultSize`` (not a constant that
drifts when the conf changes), and the materialized table's ACTUAL
``nbytes`` is re-checked after the transfer (variable-width rows can blow
through any estimate).  Callers get either an Arrow table they are
allowed to hold, or None = take the distributed tier.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: Fraction of maxResultSize a single probe may claim: headroom for Arrow
#: batch overhead, the caller's Python-side copies, and anything else the
#: driver is concurrently materializing.
_BUDGET_FRACTION = 0.5

#: Sample size for the bytes/row estimate: big enough to amortize batch
#: overhead, small enough to be a trivial first job.
_SAMPLE_ROWS = 65_536

_SIZE_RE = re.compile(r"^(\d+)([bkmgt]?)b?$")
_UNIT = {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def parse_jvm_size(text: str) -> int:
    """JVM size string ('4g', '512m', '1048576') -> bytes; 0 stays 0
    (= unlimited in Spark's convention)."""
    m = _SIZE_RE.match(str(text).strip().lower())
    if not m:
        raise ValueError(f"unparseable JVM size string: {text!r}")
    return int(m.group(1)) * _UNIT[m.group(2)]


#: Conservative per-value Arrow width (bytes) for fixed-width Spark types;
#: validity bitmaps and batch overhead are covered by the x2 safety factor
#: at the call site.
_FIXED_WIDTHS = {
    "boolean": 1,
    "byte": 1,
    "short": 2,
    "integer": 4,
    "long": 8,
    "float": 4,
    "double": 8,
    "date": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
}


def static_row_width(df: DataFrame) -> int | None:
    """Upper-bound bytes/row over Arrow when EVERY column is fixed-width
    (ints, floats, dates, bools); None when any column is variable-width
    (strings, arrays, structs, maps, decimals).  For fixed-width schemas
    the bytes/row estimate needs no sample job at all — the probe can go
    straight to the capped materialization."""
    total = 0
    for field in df.schema.fields:
        width = _FIXED_WIDTHS.get(field.dataType.typeName())
        if width is None:
            return None
        total += width
    return total


def default_probe_budget(df: DataFrame) -> int:
    """Byte budget derived from the session's live maxResultSize (0 =
    unlimited -> a generous fixed default rather than infinity: the driver
    heap is still finite)."""
    raw = df.sparkSession.conf.get("spark.driver.maxResultSize", "1g")
    limit = parse_jvm_size(raw)
    if limit == 0:
        limit = 8 << 30
    return int(limit * _BUDGET_FRACTION)


def arrow_probe(df: DataFrame, row_cap: int, byte_budget: int | None = None):
    """Materialize up to ``row_cap + 1`` rows of ``df`` on the driver via
    Arrow, byte-capped.

    Returns:
      - an Arrow table with ``num_rows <= row_cap``: the WHOLE frame fits
        the caller's tier — use it;
      - an Arrow table with ``num_rows == row_cap + 1``: the frame exceeds
        the row cap (the classic limit-probe signal) — take the
        distributed tier;
      - ``None``: the BYTE budget binds below the row cap (estimated from
        a sample, then re-checked on the actual table) — take the
        distributed tier without ever holding the oversized result.

    The sample is one cheap first job; when the frame is smaller than the
    sample cap the sample IS the answer and no second job runs.
    """
    if byte_budget is None:
        byte_budget = default_probe_budget(df)
    cap_plus = row_cap + 1
    width = static_row_width(df)
    if width is not None and cap_plus * width * 2 <= byte_budget:
        # fixed-width schema whose worst case fits the budget outright:
        # skip the bytes/row sample job (it still pays the full upstream
        # plan — on golden_records the SymSpell blocking join — just to
        # estimate a number the schema already bounds) and materialize the
        # capped probe directly; the actual-nbytes re-check still guards.
        probe = df.limit(cap_plus).toArrow()
        return None if probe.nbytes > byte_budget else probe
    sample_rows = min(_SAMPLE_ROWS, cap_plus)
    sample = df.limit(sample_rows).toArrow()
    if sample.num_rows == 0:
        return sample
    if sample.nbytes > byte_budget:
        return None  # even the sample busts the budget
    if sample.num_rows < sample_rows:
        return sample  # the limit wasn't reached: this is the whole frame
    if sample_rows == cap_plus:
        return sample  # cap+1 signal already in hand, within budget
    # sample is full-size and row_cap exceeds it: extrapolate bytes/row
    bytes_per_row = max(1.0, sample.nbytes / sample.num_rows)
    allowed_rows = int(byte_budget // bytes_per_row)
    if allowed_rows <= sample.num_rows:
        # the budget can't even hold appreciably more than the sample,
        # while row_cap is far above it — byte-bound, go distributed
        return None
    probe = df.limit(min(cap_plus, allowed_rows + 1)).toArrow()
    if probe.nbytes > byte_budget:
        return None  # variable-width rows beat the estimate
    if allowed_rows < row_cap and probe.num_rows > allowed_rows:
        # byte budget binds before the row cap and the frame needs more
        return None
    return probe
