"""SparkSession factory with scale-oriented defaults.

Tested on local[N]; the conf choices are the ones that matter on a real cluster:
AQE (runtime re-plan, skew-join splitting, partition coalescing), UTC session time
(the reference renders all timestamps as UTC, /root/reference/etl/etl.py:16), and
Arrow for any pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "carto-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default configuration.

    ``shuffle_partitions`` defaults to the local core count; on a real cluster you
    would size it to ~2-3x total executor cores or rely on AQE coalescing (enabled
    here) to shrink it at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus in ("*", "") else max(int(cpus), 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is byte-based; compute-dense shuffles (shingle
        # arrays, per-pair set intersections) carry few bytes per CPU-second,
        # so the default 1MB floor collapses them onto a handful of tasks.
        # With parallelismFirst (default on) the target is
        # totalSize/parallelism bounded below by this floor — at cluster data
        # volumes that quotient dwarfs 16KB, so the only effect is to stop
        # pathological over-coalescing of small-bytes/heavy-CPU stages
        # (measured: ngram_jaccard -61%, ingest -33%, minhash -20% at sf0.1;
        # no query regressed).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
        # Shuffles START wide and AQE coalesces them down from the RUNTIME
        # byte sizes: the static shuffle.partitions (32 here) is only the
        # post-coalesce parallelism floor via parallelismFirst, while a
        # corpus-scale run (r9: pipeline_fineweb paid 16x cost for the 10x
        # step to 5.45M docs purely in shuffle volume against the fixed 32)
        # can fan a big exchange out to up to 8x more reducers instead of
        # spilling 32 oversized partitions.  This is the documented AQE
        # sizing recipe; at toy scale the extra initial partitions coalesce
        # away before execution (A/B'd: frame32 flat at sf0.1).
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
        # ... and let AQE re-plan CACHED frames too: by default a
        # persist() pins the plan's output partitioning, which with a wide
        # initialPartitionNum would leave every cached shuffle at the full
        # 256 tasks, uncoalesced (measured: golden_records' persisted edge
        # list 2.9 -> 4.5 s without this)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # HotSpot never JIT-compiles methods past 8000 bytecodes
        # (-XX:-DontCompileHugeMethods), so a whole-stage-codegen method
        # bigger than that runs in the BYTECODE INTERPRETER forever —
        # Spark's default limit (65535) happily emits such monsters for the
        # expanded vector arithmetic (quant_recall at 505k: 74 s -> 15 s
        # with this set; every expansion-heavy entry got faster or stayed
        # flat in a 5-iteration A/B, normal queries are unaffected because
        # their methods compile under 8000 anyway).  Past the limit Spark
        # falls back to per-operator codegen, whose smaller methods JIT.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # File-packing (spark.sql.files.maxPartitionBytes) stays at Spark's
        # 128MB default HERE.  Compute-DENSE scans — an Arrow matmul stage
        # right on an embedding-corpus read, ~4MB-on-disk per CPU-second —
        # want ~16MB packing so the scan runs corpus-file-count wide
        # (measured r8: semdedup_scaled 505k fresh 37.6 s -> 12.3 s), but
        # compute density is a PER-TABLE property: applying 16MB session-wide
        # (r8, commit bc2ea1f) launched ~8x more scan tasks for every small
        # relational query and regressed the frame32 bench 22.7 -> 27.5 s
        # (pricing_summary alone 0.456 -> 0.835 s, r8 verdict A/B).  Callers
        # that read dense vector corpora scope it themselves via
        # ``dense_scan_conf()`` below / ``extra_conf`` — see
        # tools/bench_vectors.py; on a real cluster you'd set it per-job or
        # per-table the same way (embedding tables want SMALLER scan
        # partitions than fact tables).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # TIMESTAMP(NANOS) parquet (e.g. the events table) is otherwise
        # illegal for Spark's vectorized reader; read as long + convert.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 8g OOMed real workloads: the 10x golden_records fixpoint (26.9M
        # cached edge rows + 32 concurrent hash-agg tasks) threw
        # AGGREGATE_OUT_OF_MEMORY.  16g is still modest against the 128 GiB
        # box; on a real cluster this is per-executor memory sizing.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # large-result materialization (e.g. a 26.9M-row pair list at 10x is
        # ~1.7 GB of task results) must stay on the Arrow fast path: at the
        # default 1g cap toArrow() dies on maxResultSize and callers fall
        # back to row-by-row collect — 10x slower for the same bytes
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_MAX_RESULT_SIZE", "4g"),
        )
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/carto-etl-warehouse"),
        )
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


#: Scan packing for compute-dense (vector/embedding) corpora: ~16MB splits
#: keep an Arrow matmul stage that sits right on the scan as wide as the
#: corpus file count instead of 128MB-packed onto 2-3 tasks (measured r8:
#: semdedup_scaled at 505k rows, fresh 37.6 s -> 12.3 s).
DENSE_SCAN_MAX_PARTITION_BYTES = 16 * 1024 * 1024


def dense_scan_conf(spark: SparkSession | None = None) -> dict[str, str]:
    """Conf fragment for jobs whose scans feed compute-dense Arrow stages.

    ``spark.sql.files.maxPartitionBytes`` is read at EXECUTION planning, not
    at ``spark.read`` time, so there is no per-DataFrame scoping for a lazy
    plan — the narrowest safe unit is the session/job.  Pass the returned
    dict to ``get_spark(extra_conf=...)`` for a dedicated vector job, or
    call with a live ``spark`` to apply it immediately (the conf is
    runtime-settable).  Do NOT set this session-wide in a mixed
    relational+vector workload: r8 applied it globally and every small
    relational scan paid ~8x task-launch overhead (frame32 22.7 -> 27.5 s).
    """
    conf = {
        "spark.sql.files.maxPartitionBytes": str(DENSE_SCAN_MAX_PARTITION_BYTES)
    }
    if spark is not None:
        for k, v in conf.items():
            spark.conf.set(k, v)
    return conf


def local_df(spark: SparkSession, rows, schema) -> "DataFrame":
    """Driver-local rows -> DataFrame via the Arrow path.

    ``spark.createDataFrame(list, schema)`` plans a Python-RDD scan: EVERY
    job over the frame round-trips through a Python worker, which costs
    seconds per action at high local core counts (measured ~4-8 s per
    single-row parquet write at local[32] vs ~0.2 s through Arrow) and on a
    cluster serializes the rows through the Python runner for no reason.
    Routing through pandas + Arrow produces a JVM-local relation instead —
    same rows, no Python worker in any downstream job.

    Falls back to the classic list path when a float cell is NaN (pandas
    uses NaN as its null marker, so Arrow would turn NaN into NULL), when
    the schema carries timestamps (pandas localizes naive datetimes in the
    SESSION time zone while collect()/the list path use the driver's
    system zone — on a non-UTC driver the Arrow path would silently shift
    every timestamp), or when the pandas/Arrow conversion cannot represent
    the rows."""
    from pyspark.sql import types as T

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    rows = list(rows)
    try:
        if any(
            isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
            for f in schema.fields
        ):
            return spark.createDataFrame(rows, schema)
        float_idx = [
            i
            for i, f in enumerate(schema.fields)
            if isinstance(f.dataType, (T.DoubleType, T.FloatType))
        ]
        if any(
            isinstance(r[i], float) and r[i] != r[i]
            for r in rows
            for i in float_idx
        ):
            return spark.createDataFrame(rows, schema)
        import pandas as pd

        pdf = pd.DataFrame.from_records(rows, columns=schema.names)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema)
