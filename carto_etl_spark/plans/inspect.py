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


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window operators fed by an ``Exchange SinglePartition`` — the
    global-sort funnel that moves the whole input through ONE task (Spark
    warns "Moving all data to a single partition" at runtime; this makes it
    a statically assertable plan fact).  A window's required child
    distribution materializes directly beneath it (optionally behind a
    Sort), so we only inspect the couple of lines under each Window node —
    an Exchange deeper down belongs to another operator and stays out of
    scope."""
    lines = explain_str(df, "simple").splitlines()
    flagged: list[str] = []
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow(GroupLimit)?\b", ln):
            for below in lines[i + 1 : i + 4]:
                m = re.search(r"Exchange (\w+)", below)
                if m:
                    if m.group(1) == "SinglePartition":
                        flagged.append(ln.strip()[:120])
                    break
    return flagged


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan (before AQE
    runtime coalescing)."""
    return explain_str(df).count("Exchange ")
