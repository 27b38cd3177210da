"""Strict-compat SQL-text sink: reproduce the reference's generated DML
byte-for-byte (/root/reference/etl/etl.py:296-372), distributed.

The reference's IR is a SQL string per chunk (INSERT/DELETE) or per row
(UPDATE).  This module renders the same strings as DataFrame expressions —
the render layer (functions/coerce.py, functions/geom.py) produces each
value literal exactly as the reference does (golden-tested), and statements
assemble per chunk with ``collect_list`` ordered by the pinned row index.

This is a compat/egress path (e.g. replaying an existing carto-etl feed into
a PostgreSQL endpoint): the statement table itself is a DataFrame, so a
follow-up ``foreachPartition`` can POST each chunk with the same
retry-and-skip semantics as UploadJob.send.  The typed parquet path stays
the engine default — and unlike the reference, table/column identifiers here
are validated instead of interpolated blind (etl/etl.py:303 interpolates
raw, an injection surface SURVEY flags)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.config import JobConfig
from carto_etl_spark.functions.coerce import render_value_expr
from carto_etl_spark.functions.geom import render_geom_expr
from carto_etl_spark.sources.csv import with_chunk_id, with_row_index

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def insert_statements(
    df: DataFrame, cfg: JobConfig
) -> DataFrame:
    """One reference-identical INSERT statement per chunk:
    ``insert into <t> (the_geom,<cols>) values (<geom><v1><v2>...), (...)``
    with every value rendered by the golden layer (trailing-comma trims
    exactly as etl/etl.py:309-311)."""
    table = _check_ident(cfg.table_name or "target_table")
    cols = [c.lower() for c in cfg.columns_list]
    for c in cols:
        _check_ident(c)

    indexed = with_chunk_id(with_row_index(df), cfg.chunk_size)

    parts = [render_geom_expr(indexed, cfg)]
    parts += [render_value_expr(indexed, c, cfg) for c in cols]
    body = F.concat(*parts)
    # reference: per record " (" + values + strip-last-comma + "),"
    row_sql = F.concat(
        F.lit(" ("),
        F.substring(body, 1, F.length(body) - 1),
        F.lit("),"),
    )

    header = f"insert into {table} (the_geom,{','.join(cols)}) values"
    rows = indexed.select("chunk_id", "row_idx", row_sql.alias("row_sql"))
    assembled = (
        rows.groupBy("chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("row_idx", "row_sql"))
                    ),
                    lambda s: s.getField("row_sql"),
                ),
                "",
            ).alias("body")
        )
        .select(
            "chunk_id",
            F.concat(
                F.lit(header),
                F.substring(F.col("body"), 1, F.length("body") - 1),
            ).alias("statement"),
        )
    )
    return assembled


def delete_statements(df: DataFrame, cfg: JobConfig) -> DataFrame:
    """Per chunk: ``delete from <t> where <id> in (v1,...)`` with values
    routed through the same coercion (floats bare, strings quoted —
    etl/etl.py:366-370)."""
    table = _check_ident(cfg.table_name or "target_table")
    idc = _check_ident((cfg.id_column or "id").lower())
    indexed = with_chunk_id(with_row_index(df), cfg.chunk_size)
    val = render_value_expr(indexed, idc, cfg)
    rows = indexed.select("chunk_id", "row_idx", val.alias("v"))
    return (
        rows.groupBy("chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("row_idx", "v"))),
                    lambda s: s.getField("v"),
                ),
                "",
            ).alias("body")
        )
        .select(
            "chunk_id",
            F.concat(
                F.lit(f"delete from {table} where {idc} in ("),
                F.substring(F.col("body"), 1, F.length("body") - 1),
                F.lit(")"),
            ).alias("statement"),
        )
    )


def update_statements(df: DataFrame, cfg: JobConfig) -> DataFrame:
    """Per row: ``update <t> set the_geom = <geom>, <c> = <v>, ... where
    <id> = <id-val>`` — id rendered bare when float-parseable, quoted
    otherwise (etl/etl.py:341-349); id column skipped in SET."""
    from carto_etl_spark.functions.coerce import escape_expr, float_expr

    table = _check_ident(cfg.table_name or "target_table")
    idc = _check_ident((cfg.id_column or "id").lower())
    cols = [c.lower() for c in cfg.columns_list if c.lower() != idc]
    for c in cols:
        _check_ident(c)

    indexed = with_row_index(df)
    set_parts = [F.lit(" the_geom = "), render_geom_expr(indexed, cfg)]
    for c in cols:
        set_parts += [F.lit(f"{c} = "), render_value_expr(indexed, c, cfg)]
    set_sql = F.concat(*set_parts)

    id_raw = F.col(idc) if idc in indexed.columns else F.lit(None)
    id_float = float_expr(
        id_raw, cfg.float_comma_separator, cfg.float_thousand_separator
    )
    where = F.when(
        id_float.isNotNull(), F.concat(F.lit(f" where {idc} = "), id_raw)
    ).otherwise(
        F.concat(F.lit(f" where {idc} = '"), escape_expr(id_raw), F.lit("'"))
    )
    # reference: "update {t} set " + " the_geom = ..." (double space,
    # etl/etl.py:332-334) and no separator between SET items (etl/etl.py:340)
    stmt = F.concat(
        F.lit(f"update {table} set "),
        F.substring(set_sql, 1, F.length(set_sql) - 1),
        where,
    )
    return indexed.select(F.col("row_idx"), stmt.alias("statement"))
