"""Rename-free object-store state protocol (streaming/objectstore.py +
the Object* classes in streaming/state.py).

The test double (``LocalObjectStore``) exposes ONLY object-store
primitives — atomic create-if-absent, get, list, delete; its API has no
rename and no overwrite — so every green test here is evidence the
protocol never needs either.  Crash windows are simulated by stopping the
protocol at each step (data written / commit skipped) and asserting
readers still see exactly the previous committed state; replay safety by
re-running handlers against the same state."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.session import local_df
from carto_etl_spark.streaming.objectstore import (
    CommitLog,
    LocalObjectStore,
    register_object_store_factory,
    unregister_object_store_factory,
)
from carto_etl_spark.streaming.state import (
    AppendOnlyState,
    BatchSinkTarget,
    ObjectAppendOnlyState,
    ObjectSnapshotState,
    SnapshotState,
)


@pytest.fixture
def store(tmp_path):
    return LocalObjectStore(str(tmp_path / "bucket"))


@pytest.fixture
def scheme(tmp_path):
    """Register a ``testobj://`` scheme backed by one tmp store, so
    recipes can be driven with a plain URI state_dir string."""
    backing = LocalObjectStore(str(tmp_path / "scheme-bucket"))
    register_object_store_factory(
        "testobj", lambda uri: (backing, uri[len("testobj://"):].strip("/"))
    )
    yield "testobj"
    unregister_object_store_factory("testobj")


# ---------------------------------------------------------------------------
# Store primitives + commit log
# ---------------------------------------------------------------------------

def test_conditional_put_is_create_if_absent(store):
    assert store.put("a/b", b"one") is True
    assert store.put("a/b", b"two") is False  # lost: returns False, no raise
    assert store.get("a/b") == b"one"  # loser never overwrites
    assert store.list("a") == ["a/b"]
    store.delete("a/b")
    assert store.get("a/b") is None
    store.delete("a/b")  # idempotent


def test_store_api_has_no_rename_surface(store):
    assert not hasattr(store, "rename")
    assert not hasattr(store, "move")


def test_store_key_escape_guard(store, tmp_path):
    sibling = LocalObjectStore(str(tmp_path / "bucket2"))
    sibling.put("secret", b"x")
    # '../bucket2/...' normalizes OUTSIDE this store's root -> rejected,
    # including the prefix-collision case (bucket vs bucket2)
    with pytest.raises(ValueError, match="escapes"):
        store.get("../bucket2/secret")
    with pytest.raises(ValueError, match="escapes"):
        store.put("../bucket2/evil", b"y")


def test_put_staging_never_visible(store):
    """The atomic publish stages payloads in a hidden dir: list() never
    shows staging files, and a published key always carries its FULL
    payload (link happens after the write completes)."""
    store.put("x/data", b"payload-bytes")
    assert store.list("") == ["x/data"]  # no .tmp entries
    assert store.get("x/data") == b"payload-bytes"


def test_commit_same_n_collides(store):
    """Two attempts at the same commit number genuinely collide: the key
    is exactly the zero-padded number, so the conditional put returns
    False for the loser instead of silently coexisting."""
    log = CommitLog(store, "state")
    assert log.commit({"gen": "a"})
    # forge a racing writer that computed the same next n
    assert store.put("state/commits/%020d" % 2, b'{"gen": "b"}')
    assert store.put("state/commits/%020d" % 2, b'{"gen": "c"}') is False
    assert log.latest() == (2, {"gen": "b"})


def test_latest_walks_past_missing_keys(store):
    log = CommitLog(store, "state")
    log.commit({"gen": "a"})
    log.commit({"gen": "b"})
    # emulate a racing gc that removed the NEWEST listed object between
    # list and get by deleting it out from under a stale listing: latest()
    # must fall back to the readable predecessor, never crash
    store.delete("state/commits/%020d" % 2)
    assert log.latest() == (1, {"gen": "a"})
    store.delete("state/commits/%020d" % 1)
    assert log.latest() is None


def test_commit_log_latest_wins_and_gc(store):
    log = CommitLog(store, "state")
    assert log.latest() is None
    assert log.commit({"gen": "t1"})
    assert log.commit({"gen": "t2"})
    assert log.commit({"gen": "t3"})
    n, payload = log.latest()
    assert n == 3 and payload == {"gen": "t3"}
    log.gc(keep_last=2)
    assert len(store.list("state/commits")) == 2
    assert log.latest()[1] == {"gen": "t3"}


def test_conditional_put_atomic_under_contention(store):
    """N threads race one conditional put per key: exactly one winner per
    key, and every loser observes the winner's payload — the at-most-once
    property the whole commit protocol rests on."""
    import threading

    results: dict[int, list[bool]] = {i: [] for i in range(8)}

    def worker(tid):
        for k in range(50):
            results[tid].append(
                store.put(f"race/{k}", f"writer-{tid}".encode())
            )

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for k in range(50):
        winners = sum(results[t][k] for t in range(8))
        assert winners == 1, f"key race/{k}: {winners} winners"
        assert store.get(f"race/{k}") is not None


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def test_constructors_dispatch_on_object_targets(store, scheme):
    assert isinstance(SnapshotState((store, "s")), ObjectSnapshotState)
    assert isinstance(
        AppendOnlyState((store, "a"), root_name="buckets"),
        ObjectAppendOnlyState,
    )
    assert isinstance(
        SnapshotState("testobj://bkt/state"), ObjectSnapshotState
    )
    # plain paths keep the POSIX implementation
    s = SnapshotState("/tmp/whatever")
    assert type(s) is SnapshotState


def test_unregistered_uri_still_fails_loud(tmp_path):
    with pytest.raises(ValueError, match="no ObjectStore adapter"):
        SnapshotState("s3a://bucket/state")
    with pytest.raises(ValueError, match="no ObjectStore adapter"):
        AppendOnlyState("gs://bucket/state")
    with pytest.raises(ValueError, match="no ObjectStore adapter"):
        BatchSinkTarget("s3a://bucket/export")


# ---------------------------------------------------------------------------
# Snapshot protocol: crash windows, promote, ledger, gc
# ---------------------------------------------------------------------------

def _write_table(spark, tmp, name, rows, schema="k string, v long"):
    local_df(spark, rows, schema).coalesce(1).write.parquet(
        os.path.join(tmp, name)
    )


def test_snapshot_crash_before_commit_is_invisible(spark, store):
    state = SnapshotState((store, "snap"))
    assert not state.exists()
    tmp = state.begin_tmp()
    _write_table(spark, tmp, "t", [("a", 1)])
    # crash here: data staged, no commit object -> still fresh
    state2 = SnapshotState((store, "snap"))
    assert not state2.exists()
    with pytest.raises(Exception):
        state2.read(spark, "t").collect()
    # the replayed handler stages its own generation and promotes
    tmp2 = state2.begin_tmp()
    _write_table(spark, tmp2, "t", [("a", 1)])
    state2.promote()
    assert state2.exists()
    assert [(r.k, r.v) for r in state2.read(spark, "t").collect()] == [
        ("a", 1)
    ]


def test_snapshot_promote_sequence_and_gc(spark, store):
    state = SnapshotState((store, "snap"))
    for i in range(4):
        tmp = state.begin_tmp()
        _write_table(spark, tmp, "t", [("gen", i)])
        state.promote()
        assert state.read(spark, "t").collect()[0].v == i
    # retain=2: at most two generations' objects remain
    gens = {
        key[len("snap/") :].split("/", 1)[0]
        for key in store.list("snap")
        if key[len("snap/") :].startswith("gen-")
    }
    assert len(gens) <= 2


def test_snapshot_ledger_replay_detection(spark, store):
    state = SnapshotState((store, "snap"))
    tmp = state.begin_tmp()
    _write_table(spark, tmp, "cells", [("x", 10)])
    state.write_ledger(spark, tmp, ["fp-1"])
    state.promote()
    assert state.ledger_contains(spark, "fp-1")
    assert not state.ledger_contains(spark, "fp-2")
    assert state.ledger_fps(spark) == ["fp-1"]
    # next batch carries the grown ledger inside its own generation
    tmp = state.begin_tmp()
    _write_table(spark, tmp, "cells", [("x", 25)])
    state.write_ledger(spark, tmp, ["fp-1", "fp-2"])
    state.promote()
    assert sorted(state.ledger_fps(spark)) == ["fp-1", "fp-2"]
    assert state.read(spark, "cells").collect()[0].v == 25


# ---------------------------------------------------------------------------
# Append-only protocol
# ---------------------------------------------------------------------------

def test_append_commit_read_compact(spark, store):
    st = AppendOnlyState((store, "idx"), root_name="buckets")
    assert not st.exists()
    assert st.append(local_df(spark, [(1, "a")], "id long, t string"))
    assert st.append(local_df(spark, [(2, "b")], "id long, t string"))
    rows = {(r.id, r.t) for r in st.read(spark).collect()}
    assert rows == {(1, "a"), (2, "b")}
    # empty append commits nothing
    empty = local_df(spark, [], "id long, t string")
    assert st.append(empty) is False
    assert {(r.id, r.t) for r in st.read(spark).collect()} == rows
    # compaction replaces the manifest, same contents
    st.compact(st.read(spark))
    assert {(r.id, r.t) for r in st.read(spark).collect()} == rows
    # appends continue after compaction
    assert st.append(local_df(spark, [(3, "c")], "id long, t string"))
    assert len(st.read(spark).collect()) == 3


def test_append_crash_before_commit_is_invisible(spark, store):
    st = AppendOnlyState((store, "idx"), root_name="buckets")
    st.append(local_df(spark, [(1, "a")], "id long, t string"))
    # simulate the crash: data prefix written, commit skipped
    orphan = f"{st.prefix}/{st.root_name}/batch-deadbeef"
    local_df(spark, [(99, "zz")], "id long, t string").write.parquet(
        store.spark_path(orphan)
    )
    reader = AppendOnlyState((store, "idx"), root_name="buckets")
    assert {(r.id, r.t) for r in reader.read(spark).collect()} == {(1, "a")}
    # a later committed append sweeps the orphan via gc's manifest diff
    reader.append(local_df(spark, [(2, "b")], "id long, t string"))
    reader.append(local_df(spark, [(3, "c")], "id long, t string"))
    assert not store.list(orphan)


# ---------------------------------------------------------------------------
# Recipes end-to-end on the object store (URI-dispatched)
# ---------------------------------------------------------------------------

SCHEMA = "id long, item string"


def _feed(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def test_frequency_recipe_on_object_store(spark, tmp_path, scheme):
    """The count-min tracker (SnapshotState + content ledger) runs
    unchanged against an object-store URI: cross-batch merge equals the
    one-shot build, and a fresh-checkpoint replay of already-applied data
    is a ledger no-op."""
    from carto_etl_spark.operators.sketch import cms_build
    from carto_etl_spark.streaming.frequency import (
        load_frequency_sketch,
        track_frequencies,
    )

    src = str(tmp_path / "src")
    state = "testobj://bkt/freq-state"
    b1 = [(1, "apple"), (2, "banana"), (3, "apple")]
    b2 = [(4, "apple"), (5, "cherry"), (6, "banana")]

    def run(ckpt):
        stream = spark.readStream.schema(SCHEMA).option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        q = track_frequencies(
            stream, "item", state_dir=state, depth=4, width=256,
            checkpoint=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    _feed(spark, src, "b1", b1)
    run("c1")

    def cells(df):
        return {(r["seed"], r["bucket"]): r["n"] for r in df.collect()}

    # fresh checkpoint = full redelivery of b1 (same micro-batch content):
    # the content ledger makes it a no-op on the object store as on POSIX
    after_b1 = cells(load_frequency_sketch(spark, state))
    run("c2")
    assert cells(load_frequency_sketch(spark, state)) == after_b1

    _feed(spark, src, "b2", b2)
    run("c1")
    streamed = cells(load_frequency_sketch(spark, state))
    oneshot = cells(
        cms_build(spark.createDataFrame(b1 + b2, SCHEMA), "item", 4, 256)
    )
    assert streamed == oneshot


def test_lshindex_recipe_on_object_store(spark, scheme):
    """The LSH bucket index (AppendOnlyState) builds, extends and compacts
    against an object-store URI through its public functions."""
    from carto_etl_spark.operators.dedup import with_minhash
    from carto_etl_spark.streaming.lshindex import (
        append_to_index,
        compact_index,
        have_index,
    )

    state = "testobj://bkt/lsh-state"
    docs = local_df(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog again"),
         (2, "an entirely different document about spark internals")],
        "doc_id long, text string",
    )
    signed = with_minhash(docs, "text", num_hashes=64)
    assert not have_index(state)
    append_to_index(signed, state, "doc_id", bands=32)
    assert have_index(state)
    # replayed append: id-anti-join makes it a no-op on the object store
    append_to_index(signed, state, "doc_id", bands=32)
    n = compact_index(spark, state)
    assert n > 0
    more = local_df(
        spark,
        [(3, "yet another unrelated text about parquet files")],
        "doc_id long, text string",
    )
    append_to_index(
        with_minhash(more, "text", num_hashes=64), state, "doc_id", bands=32
    )
    assert have_index(state)
    assert compact_index(spark, state) > n


def test_cardinality_quantile_kmeans_vecindex_on_object_store(
    spark, tmp_path, scheme
):
    """The remaining four state recipes run against object-store URIs: the
    HLL tracker (idempotent SnapshotState), the quantile tracker
    (SnapshotState + ledger), the mini-batch k-means state (SnapshotState
    + ledger, seeded fold), and the vector near-dup index
    (AppendOnlyState).  Together with frequency/lshindex/export above,
    all seven recipes inherit the rename-free protocol."""
    from carto_etl_spark.streaming.cardinality import (
        load_cardinality_registers,
        track_cardinality,
    )
    from carto_etl_spark.streaming.kmeansstate import (
        apply_kmeans_batch,
        load_kmeans_state,
    )
    from carto_etl_spark.streaming.quantile import (
        state_quantiles,
        track_quantiles,
    )
    from carto_etl_spark.streaming.vecindex import (
        append_to_vec_index,
        compact_vec_index,
        have_vec_index,
    )

    # HLL cardinality through a real stream
    src = str(tmp_path / "csrc")
    _feed(spark, src, "b1", [(i, f"item-{i % 7}") for i in range(40)])
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = track_cardinality(
        stream, "item", state_dir="testobj://bkt/card",
        checkpoint=str(tmp_path / "cc"),
    )
    q.awaitTermination(120)
    regs = load_cardinality_registers(spark, "testobj://bkt/card")
    assert regs.count() > 0

    # quantile tracker through a real stream
    qsrc = str(tmp_path / "qsrc")
    spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "k long, v double"
    ).coalesce(1).write.parquet(os.path.join(qsrc, "b1"))
    qstream = spark.readStream.schema("k long, v double").option(
        "recursiveFileLookup", "true"
    ).parquet(qsrc)
    q = track_quantiles(
        qstream, "v", "k", state_dir="testobj://bkt/quant", cap=256,
        checkpoint=str(tmp_path / "qc"),
    )
    q.awaitTermination(120)
    med = state_quantiles(spark, "testobj://bkt/quant", [0.5]).collect()
    assert len(med) == 1 and 80 <= med[0]["est"] <= 120

    # mini-batch k-means state: direct batch application (the writeStream
    # drive equals direct batches — pinned by test_streaming_kmeans)
    vecs = local_df(
        spark,
        [(i, [float(i % 3), float((i * 7) % 5)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    assert apply_kmeans_batch(vecs, "testobj://bkt/km", k=3) is True
    # replay: the content ledger inside the committed generation skips it
    assert apply_kmeans_batch(vecs, "testobj://bkt/km", k=3) is False
    centroids, counts = load_kmeans_state(spark, "testobj://bkt/km")
    assert len(centroids) == 3 and sum(counts) == 30

    # vector near-dup index (AppendOnlyState)
    emb = local_df(
        spark,
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    append_to_vec_index(emb, "testobj://bkt/vec", dim=4)
    assert have_vec_index("testobj://bkt/vec")
    assert compact_vec_index(spark, "testobj://bkt/vec") > 0


def test_export_sink_on_object_store(spark, tmp_path, scheme):
    """The _SUCCESS-gated JSONL export writes to an object target through
    BatchSinkTarget and reads back every complete batch."""
    from carto_etl_spark.streaming.export import (
        complete_batch_dirs,
        read_stream_export,
        stream_export_jsonl,
    )

    src = str(tmp_path / "xsrc")
    target = "testobj://bkt/export"
    rows = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    _feed(spark, src, "b1", rows)
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = stream_export_jsonl(
        stream, target, n_shards=2, key_col="id",
        checkpoint=str(tmp_path / "xc"),
    )
    q.awaitTermination(120)
    assert len(complete_batch_dirs(target)) == 1
    back = read_stream_export(spark, target, SCHEMA)
    assert {(r.id, r.item) for r in back.collect()} == set(rows)
