"""TransactionalTable: atomic manifest commits, snapshot isolation, OCC,
vacuum, and composition with the Insert/Update/Delete jobs."""

from __future__ import annotations

import json

import pytest

from carto_etl_spark.operators.jobs import DeleteJob, InsertJob, UpdateJob
from carto_etl_spark.operators.transactional import (
    CommitConflict,
    TransactionalTable,
)


def _rows(df):
    return sorted((r[0], r[1]) for r in df.collect())


def test_append_and_overwrite_versions(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t")
    assert not t.exists()
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    assert t.version() == 2
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    t.overwrite(spark.createDataFrame([(3, "c")], ["id", "v"]))
    assert t.version() == 3
    assert _rows(t.read()) == [(3, "c")]
    # time travel to the pre-overwrite snapshot
    assert _rows(t.read(version=2)) == [(1, "a"), (2, "b")]


def test_snapshot_isolation_across_overwrite_and_vacuum(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    pinned = t.read()  # plan pins version 1's files
    t.overwrite(spark.createDataFrame([(2, "b")], ["id", "v"]))
    # retain both snapshots: the pinned reader still sees version 1
    t.vacuum(retain_versions=2)
    assert _rows(pinned) == [(1, "a")]
    # retaining only the latest deletes version 1's files
    deleted = t.vacuum(retain_versions=1)
    assert deleted, "old snapshot files should be removed"
    assert _rows(t.read()) == [(2, "b")]


def test_commit_conflict_retry(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    # simulate a concurrent writer landing version 2 first
    clash = t._manifest_path(2)
    clash.write_text(json.dumps({
        "version": 2, "files": t._read_manifest(1)["files"], "timestamp": 0,
    }))
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    # our append retried onto version 3, preserving the interloper's files
    assert t.version() == 3
    assert _rows(t.read()) == [(1, "a"), (2, "b")]


def test_commit_conflict_exhaustion(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t", max_commit_retries=0)
    with pytest.raises(CommitConflict):
        t._commit_with_retry([], "append")


def test_concurrent_appends_all_land(spark, tmp_path):
    # 6 threads race appends through the OCC loop: every commit must land
    # (no lost updates), versions must be a contiguous 1..6, and the final
    # snapshot must contain every thread's rows exactly once.
    from concurrent.futures import ThreadPoolExecutor

    t = TransactionalTable(spark, tmp_path / "race", max_commit_retries=50)

    def add(i):
        t.append(spark.createDataFrame([(i, f"w{i}")], ["id", "v"]))

    with ThreadPoolExecutor(max_workers=6) as pool:
        list(pool.map(add, range(6)))

    assert t.version() == 6
    assert t._versions() == [1, 2, 3, 4, 5, 6]
    assert sorted(r["id"] for r in t.read().collect()) == list(range(6))


def test_crash_leftover_tmp_manifest_ignored(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    # a writer that died before publishing leaves only a .tmp- file
    (t.log_dir / ".tmp-deadbeef.json").write_text("{}")
    assert t.version() == 1
    assert _rows(t.read()) == [(1, "a")]


def test_compact_folds_small_commits(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t", stats_columns=["id"])
    for i in range(5):
        t.append(spark.createDataFrame(
            [(i * 10 + j, "v") for j in range(10)], ["id", "v"]
        ).coalesce(1))
    assert len(t.read().inputFiles()) == 5
    v = t.compact(num_files=1)
    assert v == 6
    assert len(t.read().inputFiles()) == 1
    assert sorted(r["id"] for r in t.read().collect()) == list(range(50))
    # pre-compaction snapshot still time-travelable
    assert len(t.read(version=5).inputFiles()) == 5
    # compacted file re-collected stats: skipping still works
    assert len(t.read_where("id", lo=0, hi=9).collect()) == 10


def test_data_skipping_read_where(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t", stats_columns=["id"])
    # three commits with disjoint id ranges -> three file sets
    for lo in (0, 100, 200):
        t.append(spark.createDataFrame(
            [(lo + i, f"v{lo + i}") for i in range(10)], ["id", "v"]
        ).coalesce(1))
    all_files = set(t.read().inputFiles())
    assert len(all_files) == 3

    pruned = t.read_where("id", lo=100, hi=109)
    # file-level pruning happened before the scan was planned
    assert len(set(pruned.inputFiles())) == 1
    assert sorted(r["id"] for r in pruned.collect()) == list(range(100, 110))

    # range matching nothing: zero files, empty result, schema intact
    none = t.read_where("id", lo=10_000)
    assert none.collect() == [] and none.columns == ["id", "v"]

    # untracked column: no pruning, still exact
    v_rows = t.read_where("v", lo="v100", hi="v100").collect()
    assert [r["id"] for r in v_rows] == [100]


def test_idempotent_append(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    t.append(df, idempotency_key="batch-0")
    t.append(df, idempotency_key="batch-0")  # replay: must be a no-op
    t.append(df, idempotency_key="batch-1")
    assert t.version() == 2
    assert len(t.read().collect()) == 2


def test_streaming_exactly_once_sink(spark, tmp_path):
    import shutil

    from carto_etl_spark.streaming.jobs import (
        insert_stream_transactional,
        stream_csv_dir,
    )
    from carto_etl_spark.config import JobConfig

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "a.csv").write_text("id,v\n1,x\n2,y\n")
    cfg = JobConfig(columns="id,v", force_no_geometry=True)
    t = TransactionalTable(spark, tmp_path / "t")
    ckpt = tmp_path / "ckpt"

    stream = stream_csv_dir(spark, str(src), "id string, v string")
    q = insert_stream_transactional(stream, t, cfg, checkpoint=str(ckpt))
    q.awaitTermination(60)
    assert len(t.read().collect()) == 2

    # simulate the at-least-once hole: wipe the checkpoint so the engine
    # replays batch 0 from scratch — the idempotency key must absorb it
    shutil.rmtree(ckpt)
    stream2 = stream_csv_dir(spark, str(src), "id string, v string")
    q2 = insert_stream_transactional(stream2, t, cfg, checkpoint=str(ckpt))
    q2.awaitTermination(60)
    assert len(t.read().collect()) == 2, "replayed batch was double-committed"


def test_jobs_compose_with_transactional_table(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t")
    base = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", "c")], ["id", "v"]
    )
    InsertJob(base, spark=spark, target=t, columns="id,v",
              force_no_geometry="true").run()
    upd = tmp_path / "u.csv"
    upd.write_text("id,v\n2,B\n")
    UpdateJob("id", str(upd), spark=spark, target=t, columns="id,v",
              force_no_geometry="true").run()
    dl = tmp_path / "d.csv"
    dl.write_text("id\n3\n")
    DeleteJob("id", str(dl), spark=spark, target=t, columns="id",
              force_no_geometry="true").run()
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {1.0: "a", 2.0: "B"}
    # every step was one commit: insert, update-rewrite, delete-rewrite
    assert t.version() == 3
    # prior snapshots are still time-travelable until vacuumed
    assert len(t.read(version=1).collect()) == 3


def test_stats_collected_for_many_files_in_one_commit(spark, tmp_path):
    """A single commit landing ~1k data files must stats-match every file
    (linear dict lookup on the path tail, not a quadratic endswith scan)."""
    t = TransactionalTable(spark, tmp_path / "t", stats_columns=["id"])
    n_files = 1000
    df = (
        spark.range(n_files)
        .withColumnRenamed("id", "id")
        .repartitionByRange(n_files, "id")
    )
    t.append(df)
    manifest = json.loads(
        (t.log_dir / "00000001.json").read_text()
    )
    stats = manifest["stats"]
    # every non-empty parquet file got a stats entry keyed by its rel path
    assert set(stats) <= set(manifest["files"])
    covered = sum(1 for v in stats.values() if "id" in v)
    assert covered >= 990  # range partitioning: ~every file non-empty
    lo = min(v["id"][0] for v in stats.values())
    hi = max(v["id"][1] for v in stats.values())
    assert (lo, hi) == (0, n_files - 1)


def test_manifest_size_warning_past_threshold(spark, tmp_path):
    t = TransactionalTable(spark, tmp_path / "t", manifest_warn_files=3)
    df = spark.range(8).repartitionByRange(8, "id")
    with pytest.warns(RuntimeWarning, match="compact"):
        t.append(df)
    # warning is advisory: the commit still landed
    assert t.read().count() == 8


# ---------------------------------------------------------------------------
# Schema evolution
# ---------------------------------------------------------------------------

def test_append_new_column_null_fills_old_files(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "evo")
    t.append(spark.createDataFrame([(1, "a")], ["id", "name"]))
    t.append(spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"]))
    out = t.read()
    assert set(out.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in out.collect()}
    assert rows[1].score is None          # pre-evolution file null-fills
    assert rows[2].score == 9.5
    # time travel reads the OLD schema, not the evolved one
    assert set(t.read(version=1).columns) == {"id", "name"}


def test_append_type_conflict_rejected(spark, tmp_path):
    import pytest as _pytest

    from carto_etl_spark.operators.transactional import (
        SchemaEvolutionError,
        TransactionalTable,
    )

    t = TransactionalTable(spark, tmp_path / "evo2")
    t.append(spark.createDataFrame([(1, "a")], ["id", "name"]))
    bad = spark.createDataFrame([(2, 3)], "id long, name long")
    with _pytest.raises(SchemaEvolutionError, match="name"):
        t.append(bad)


def test_evolved_schema_survives_compact_and_skipping(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "evo3")
    t.append(spark.createDataFrame([(i, f"n{i}") for i in range(5)], ["id", "name"]))
    t.append(spark.createDataFrame([(9, "x", 1.5)], ["id", "name", "score"]))
    t.compact(num_files=1)
    out = t.read()
    assert set(out.columns) == {"id", "name", "score"}
    assert out.count() == 6
    skipped = t.read_where("id", lo=9)
    assert set(skipped.columns) == {"id", "name", "score"}
    assert skipped.collect()[0].score == 1.5


# ---------------------------------------------------------------------------
# Copy-on-write delete
# ---------------------------------------------------------------------------

def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "cow", stats_columns=["id"])
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(0, 10)],
                                   ["id", "name"]).coalesce(1))
    t.append(spark.createDataFrame([(i, f"b{i}") for i in range(100, 110)],
                                   ["id", "name"]).coalesce(1))
    files_before = set(t.snapshot_files())
    v = t.delete_where("id", lo=3, hi=5)
    out = t.read()
    assert out.count() == 17
    assert {r.id for r in out.collect()} == set(range(0, 3)) | set(range(6, 10)) | set(range(100, 110))
    # the 100..109 file is stats-pruned from the rewrite: it survives verbatim
    files_after = set(t.snapshot_files())
    assert any(f in files_after for f in files_before)  # untouched carryover
    # time travel still sees the pre-delete rows
    assert t.read(version=v - 1).count() == 20


def test_delete_where_no_match_is_zero_commit(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "cow2", stats_columns=["id"])
    t.append(spark.createDataFrame([(1, "x"), (2, "y")], ["id", "name"]).coalesce(1))
    v0 = t.version()
    assert t.delete_where("id", lo=50, hi=90) == v0  # stats prune everything
    assert t.version() == v0


def test_delete_where_nulls_survive(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "cow3", stats_columns=["score"])
    t.append(spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 9.0)], "id long, score double").coalesce(1))
    t.delete_where("score", lo=4.0, hi=6.0)
    rows = {r.id: r.score for r in t.read().collect()}
    assert rows == {2: None, 3: 9.0}  # null never matches a range


# ---------------------------------------------------------------------------
# Copy-on-write upsert (MERGE)
# ---------------------------------------------------------------------------

def test_upsert_updates_inserts_and_prunes(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "ups", stats_columns=["id"])
    t.append(spark.createDataFrame([(i, f"a{i}") for i in range(0, 10)],
                                   ["id", "name"]).coalesce(1))
    t.append(spark.createDataFrame([(i, f"b{i}") for i in range(100, 110)],
                                   ["id", "name"]).coalesce(1))
    files_before = set(t.snapshot_files())
    # touches only the 0..9 file; 100..109 carries over untouched
    ups = spark.createDataFrame([(3, "NEW3"), (50, "INS50")],
                                ["id", "name"]).coalesce(1)
    v = t.upsert(ups, key="id")
    rows = {r.id: r.name for r in t.read().collect()}
    assert rows[3] == "NEW3"            # matched row replaced
    assert rows[50] == "INS50"          # unmatched row inserted
    assert rows[0] == "a0" and rows[105] == "b105"
    assert len(rows) == 21
    assert any(f in set(t.snapshot_files()) for f in files_before)
    assert t.read(version=v - 1).count() == 20  # time travel pre-merge


def test_upsert_last_wins_and_empty_table(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "ups2", stats_columns=["id"])
    # duplicate keys inside the update set collapse before merging
    ups = spark.createDataFrame([(1, "x"), (1, "y")], ["id", "name"])
    t.upsert(ups, key="id")
    assert t.read().count() == 1  # upsert into empty table == insert


def test_upsert_evolves_schema(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "ups3", stats_columns=["id"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"]).coalesce(1))
    ups = spark.createDataFrame([(2, "B", 7.5)], ["id", "name", "score"]).coalesce(1)
    t.upsert(ups, key="id")
    rows = {r.id: r for r in t.read().collect()}
    assert rows[2].score == 7.5
    assert rows[1].score is None  # survivor from pre-evolution file


# ---------------------------------------------------------------------------
# Snapshot diff / change feed
# ---------------------------------------------------------------------------

def test_diff_surfaces_inserts_deletes_and_update_pairs(spark, tmp_path):
    from pyspark.sql import functions as F
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "cdf", stats_columns=["id"])
    t.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "name"]).coalesce(1))
    v1 = t.version()
    t.upsert(spark.createDataFrame([(2, "B"), (4, "d")], ["id", "name"])
             .coalesce(1), key="id")
    t.delete_where("id", lo=3, hi=3)
    out = {(r["id"], r["name"], r["_change"])
           for r in t.diff(v1).collect()}
    assert out == {
        (2, "B", "insert"), (4, "d", "insert"),   # update half + pure insert
        (2, "b", "delete"), (3, "c", "delete"),   # update half + pure delete
    }


def test_diff_skips_carried_files_entirely(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable
    from carto_etl_spark.plans.inspect import explain_str

    t = TransactionalTable(spark, tmp_path / "cdf2", stats_columns=["id"])
    t.append(spark.createDataFrame([(i, "keep") for i in range(100)],
                                   ["id", "name"]).coalesce(1))
    v1 = t.version()
    t.append(spark.createDataFrame([(100, "new")], ["id", "name"]).coalesce(1))
    d = t.diff(v1)
    # the carried v1 file must not appear in either scan
    carried = t.snapshot_files(v1)[0]
    assert carried not in explain_str(d)
    assert {(r["id"], r["_change"]) for r in d.collect()} == {(100, "insert")}


def test_diff_same_version_is_empty_and_typed(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "cdf3")
    t.append(spark.createDataFrame([(1, "a")], ["id", "name"]).coalesce(1))
    d = t.diff(t.version(), t.version())
    assert d.columns == ["id", "name", "_change"]
    assert d.count() == 0


def test_diff_from_empty_table_is_all_inserts(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "cdf4")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
             .coalesce(1))
    out = {(r["id"], r["_change"]) for r in t.diff(0).collect()}
    assert out == {(1, "insert"), (2, "insert")}


def test_diff_null_filled_evolved_column_not_spurious(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "cdf5")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
             .coalesce(1))
    v1 = t.version()
    # additive evolution: new file carries `score`, old file null-fills it.
    # rows 1/2 live in a CARRIED file -> must not surface in the diff
    t.append(spark.createDataFrame([(3, "c", 9.5)], ["id", "name", "score"])
             .coalesce(1))
    out = {(r["id"], r["score"], r["_change"]) for r in t.diff(v1).collect()}
    assert out == {(3, 9.5, "insert")}


def test_diff_bag_semantics_multiplicity(spark, tmp_path):
    from carto_etl_spark.operators.transactional import TransactionalTable

    t = TransactionalTable(spark, tmp_path / "cdf6")
    t.append(spark.createDataFrame([(1, "x"), (1, "x")], ["id", "name"])
             .coalesce(1))
    v1 = t.version()
    t.overwrite(spark.createDataFrame([(1, "x")], ["id", "name"]).coalesce(1))
    out = [(r["id"], r["_change"]) for r in t.diff(v1).collect()]
    assert out == [(1, "delete")]  # one copy removed, one survives
