"""Physical-plan inspection helpers: the engine's scale contract is that
filters push into scans, scans prune columns, small dims broadcast, and hot
expressions stay inside whole-stage codegen.  These helpers turn
``explain()`` output into assertable facts (used by tests/test_plans.py and
by engine development as a feedback loop)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings per scan (column pruning evidence)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_str(df))


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df):
        inner = schema[len("struct<"):-1]
        for fld in inner.split(","):
            if ":" in fld:
                cols.add(fld.split(":")[0].strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def codegen_stage_count(df: DataFrame) -> int:
    # formatted mode tags operators with "[codegen id : N]"
    return len(set(re.findall(r"codegen id : (\d+)", explain_str(df))))


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan (before AQE
    runtime coalescing)."""
    return explain_str(df).count("Exchange ")
