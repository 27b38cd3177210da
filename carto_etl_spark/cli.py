"""CLI driver with the reference's operating model: an ``etl.conf``
(same sections/keys as /root/reference/etl.conf.example, flattened exactly
like the samples' ``flatten()`` helper, sample01/run_etl.py:40-47) plus an
action verb.

    python -m carto_etl_spark.cli insert --conf etl.conf --csv data.csv --target /data/mytable
    python -m carto_etl_spark.cli update --conf etl.conf --csv upd.csv --target /data/mytable --id-column a
    python -m carto_etl_spark.cli delete --conf etl.conf --csv del.csv --target /data/mytable --id-column a
    python -m carto_etl_spark.cli overviews --target /data/mytable --max-zoom 8
    python -m carto_etl_spark.cli query --sql "SELECT ..." --table t=/data/mytable
    python -m carto_etl_spark.cli profile --target /data/mytable
    python -m carto_etl_spark.cli shuffle --target /data/mytable --out /data/shuffled --id-column doc_id --shards 8

A reference user keeps their conf file; ``base_url``/``api_key`` are accepted
and ignored (the engine executes locally on Spark instead of POSTing to the
CARTO SQL API), and the target is a parquet table path."""

from __future__ import annotations

import argparse
import configparser
import logging
import sys
import time

from carto_etl_spark.operators.jobs import (
    DeleteJob,
    InsertJob,
    TargetTable,
    UpdateJob,
)
from carto_etl_spark.session import get_spark

logger = logging.getLogger("carto-etl-spark")


def load_conf(path: str | None) -> dict:
    """Flatten every section's keys into one kwargs dict (the samples'
    ``flatten()``, later sections win like dict.update)."""
    if not path:
        return {}
    parser = configparser.RawConfigParser()
    parser.read(path)
    kwargs: dict = {}
    for section in parser.sections():
        kwargs.update(dict(parser.items(section)))
    return kwargs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="carto_etl_spark")
    p.add_argument(
        "action",
        choices=[
            "insert", "update", "delete", "overviews", "query", "profile",
            "shuffle",
        ],
    )
    p.add_argument("--conf", help="etl.conf path (reference format)")
    p.add_argument("--csv", help="input CSV path")
    p.add_argument(
        "--target",
        help="parquet table path (required for DML verbs; for `query` it is "
        "the output directory — omit to print rows to stdout)",
    )
    p.add_argument("--sql", help="SQL text for the query verb")
    p.add_argument("--sql-file", help="file containing SQL (query verb)")
    p.add_argument(
        "--table",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="register PATH (parquet dir, or .csv file) as view NAME for "
        "the query verb; repeatable",
    )
    p.add_argument(
        "--format",
        default="csv",
        choices=["csv", "parquet", "json"],
        help="query output format when --target is given",
    )
    p.add_argument(
        "--limit",
        type=int,
        default=100,
        help="rows printed to stdout when query has no --target",
    )
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the optimized physical plan instead of executing "
        "(query verb)",
    )
    p.add_argument(
        "--id-column", help="key column for update/delete/shuffle"
    )
    p.add_argument(
        "--out", help="output parquet path (shuffle verb)"
    )
    p.add_argument(
        "--shards", type=int, default=8,
        help="shard count for the shuffle verb",
    )
    p.add_argument(
        "--seed", type=int, default=0,
        help="shuffle seed (same seed -> same order)",
    )
    p.add_argument("--start-chunk", type=int, default=1)
    p.add_argument("--end-chunk", type=int, default=None)
    p.add_argument("--max-zoom", type=int, default=8)
    p.add_argument("--master", default=None, help="spark master override")
    p.add_argument(
        "--transactional",
        action="store_true",
        help="use the manifest-commit table (atomic commits, snapshot "
        "isolation, time travel) instead of the plain parquet directory",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    kwargs = load_conf(args.conf)
    # remote-API settings have no local meaning
    for k in ("base_url", "api_key", "app_code", "app_id"):
        kwargs.pop(k, None)

    if args.action not in ("query", "profile", "shuffle") and not args.target:
        logger.error("--target required for %s", args.action)
        return 2

    spark = get_spark(app_name=f"carto-etl-{args.action}", master=args.master)

    if args.action == "profile":
        # the stats screen a user runs before touching a new table: one
        # aggregation pass over the bytes (operators/stats.py)
        from carto_etl_spark.operators.stats import profile

        path = args.target or args.csv
        if not path:
            logger.error("profile needs --target (parquet) or --csv")
            return 2
        if path.endswith(".csv"):
            df = spark.read.option("header", True).csv(path)
        else:
            df = spark.read.parquet(path)
        header = (
            "column", "rows", "nulls", "distinct", "min", "max"
        )
        print("\t".join(header))
        for r in profile(df).collect():
            print(
                "\t".join(
                    str(v) if v is not None else ""
                    for v in (
                        r["col_name"], r["n_rows"], r["n_nulls"],
                        r["n_distinct"], r["min_value"], r["max_value"],
                    )
                )
            )
        return 0

    if args.action == "shuffle":
        # training-data prep: write a deterministically shuffled, sharded
        # copy (operators/shuffle.py) — one dir per shard, rows inside each
        # file in position order, so readers stream shards 0..n-1 and get
        # the reproducible global order
        from carto_etl_spark.operators.shuffle import global_shuffle

        if not (args.target and args.out and args.id_column):
            logger.error("shuffle needs --target, --out, --id-column")
            return 2
        df = spark.read.parquet(args.target)
        out = global_shuffle(df, args.id_column, args.shards, seed=args.seed)
        (
            out.sortWithinPartitions("shard", "position")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(args.out)
        )
        n = spark.read.parquet(args.out).count()
        print(
            f"shuffle complete: {n} rows in {args.shards} shards at {args.out}"
        )
        return 0

    if args.action == "query":
        # the reference POSTs SQL text to the CARTO SQL API
        # (/root/reference/etl/etl.py request path); this verb is the local
        # execution twin — same statement, run by Spark over registered views
        sql = args.sql
        if args.sql_file:
            with open(args.sql_file) as fh:
                sql = fh.read()
        if not sql:
            logger.error("--sql or --sql-file required for query")
            return 2
        for spec in args.table:
            name, _, path = spec.partition("=")
            if not path:
                logger.error("--table expects NAME=PATH, got %r", spec)
                return 2
            reader = spark.read
            if path.endswith(".csv"):
                df = reader.option("header", True).csv(path)
            else:
                df = reader.parquet(path)
            df.createOrReplaceTempView(name)
        result = spark.sql(sql)
        if args.explain:
            from carto_etl_spark.plans.inspect import explain_str

            print(explain_str(result))
            return 0
        if args.target:
            writer = result.write.mode("overwrite")
            if args.format == "csv":
                writer.option("header", True).csv(args.target)
            else:
                getattr(writer, args.format)(args.target)
            print(f"query complete: wrote {args.format} to {args.target}")
        else:
            for row in result.take(args.limit):
                print(",".join("" if v is None else str(v) for v in row))
        return 0

    if args.transactional:
        from carto_etl_spark.operators.transactional import TransactionalTable

        target = TransactionalTable(spark, args.target)
    else:
        target = TargetTable(spark, args.target)

    def observer(event: dict) -> None:
        logger.info("%s: %s", event["type"], event["msg"])

    kwargs.setdefault("observer", observer)

    if args.action == "overviews":
        job = InsertJob(args.csv or "", spark=spark, target=target, **{
            k: v for k, v in kwargs.items() if k != "observer"
        })
        job_id = job.regenerate_overviews(max_zoom=args.max_zoom)
        while True:
            status = job.check_job(job_id)
            logger.info("overview job %s: %s", job_id, status["status"])
            if status["status"] in ("done", "failed", "unknown"):
                print(status)
                return 0 if status["status"] == "done" else 1
            time.sleep(1)

    if not args.csv:
        logger.error("--csv required for %s", args.action)
        return 2
    if args.action == "insert":
        job = InsertJob(args.csv, spark=spark, target=target, **kwargs)
        job.run(start_chunk=args.start_chunk, end_chunk=args.end_chunk)
    elif args.action == "update":
        if not args.id_column:
            logger.error("--id-column required for update")
            return 2
        job = UpdateJob(
            args.id_column, args.csv, spark=spark, target=target, **kwargs
        )
        job.run()
    else:
        if not args.id_column:
            logger.error("--id-column required for delete")
            return 2
        job = DeleteJob(
            args.id_column, args.csv, spark=spark, target=target, **kwargs
        )
        job.run(start_chunk=args.start_chunk, end_chunk=args.end_chunk)

    print(f"{args.action} complete: {target.read().count()} rows in target")
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    raise SystemExit(main())
