"""Edge-path coverage: per-chunk writes, update row ranges, SRID transform
round-trip, strptime 12-hour formats, exact dedup variants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.functions.coerce import strptime_to_spark, timestamp_expr
from carto_etl_spark.functions.geom import point_struct, st_x, st_y, transform_point
from carto_etl_spark.operators.dedup import exact_dedup
from carto_etl_spark.operators.jobs import InsertJob, TargetTable, UpdateJob


def test_insert_per_chunk_writes(spark, tmp_path):
    df = spark.createDataFrame([(f"r{i}",) for i in range(25)], ["a"])
    target = TargetTable(spark, tmp_path / "chunked")
    events = []
    InsertJob(
        df, spark=spark, target=target, columns="a", chunk_size="10",
        force_no_geometry="true", observer=lambda m: events.append(m),
    ).run(per_chunk_writes=True)
    assert target.read().count() == 25
    # one progress event per chunk (25 rows / 10 -> 3 chunks)
    assert [e["msg"] for e in events if e["type"] == "progress"] == ["1", "2", "3"]


def test_per_chunk_writes_partition_cap(spark, tmp_path):
    """The strict-parity path must refuse to plan more output partitions /
    observer callbacks than the cap — at 100 TB with chunk_size=1000 it
    would otherwise plan ~10^8 of each, both driver-side scale-killers."""
    df = spark.createDataFrame([(f"r{i}",) for i in range(25)], ["a"])
    target = TargetTable(spark, tmp_path / "capped")
    job = InsertJob(
        df, spark=spark, target=target, columns="a", chunk_size="2",
        force_no_geometry="true",
    )
    with pytest.raises(ValueError, match="per_chunk_writes would plan"):
        job.run(per_chunk_writes=True, max_chunk_partitions=5)
    # under the cap the same job succeeds
    InsertJob(
        df, spark=spark, target=target, columns="a", chunk_size="2",
        force_no_geometry="true",
    ).run(per_chunk_writes=True, max_chunk_partitions=13)
    assert target.read().count() == 25


def test_default_insert_plans_one_write_job(spark, tmp_path, monkeypatch):
    """Plan-count gate: the default path issues exactly ONE append (one
    distributed write job) no matter how many chunks the data spans, and the
    total Spark-job count does not scale with the chunk count."""
    appends = []
    orig_append = TargetTable.append

    def counting_append(self, df):
        appends.append(1)
        return orig_append(self, df)

    monkeypatch.setattr(TargetTable, "append", counting_append)

    sc = spark.sparkContext

    def run_insert(chunk_size, path):
        df = spark.createDataFrame([(f"r{i}",) for i in range(60)], ["a"])
        target = TargetTable(spark, path)
        sc.setJobGroup(f"gate-{chunk_size}", "plan-count gate")
        try:
            InsertJob(
                df, spark=spark, target=target, columns="a",
                chunk_size=str(chunk_size), force_no_geometry="true",
            ).run()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(f"gate-{chunk_size}"))

    jobs_small_chunks = run_insert(2, tmp_path / "g2")    # 30 chunks
    n_appends_small = len(appends)
    jobs_large_chunks = run_insert(30, tmp_path / "g30")  # 2 chunks
    assert n_appends_small == 1
    assert len(appends) == 2  # one more append for the second run
    # job count is a plan property: identical regardless of chunk count
    assert jobs_small_chunks == jobs_large_chunks


def test_csv_rfc4180_quote_unescape(spark, tmp_path):
    # The reference reads with csv.DictReader (doublequote=True, no backslash
    # escapes): "qu""ote" -> qu"ote, backslashes literal.  Spark's default
    # escape char is backslash, which leaves "" unparsed — read_csv overrides
    # it (sources/csv.py).
    from carto_etl_spark.sources.csv import read_csv

    p = tmp_path / "q.csv"
    p.write_text(
        'id,name\n1,"qu""ote"\n2,"a,b"\n3,back\\slash\n4,"multi ""q"" uoted"\n'
    )
    rows = {r["id"]: r["name"] for r in read_csv(spark, str(p)).collect()}
    assert rows == {
        "1": 'qu"ote',
        "2": "a,b",
        "3": "back\\slash",
        "4": 'multi "q" uoted',
    }


def test_csv_unbounded_field_width(spark, tmp_path):
    # Reference S5: csv.field_size_limit raised to the platform max
    # (etl/etl.py:127-136).  Spark's univocity parser caps fields at 1M chars
    # by default; read_csv sets maxCharsPerColumn=-1, so a multi-megabyte
    # single cell must survive the scan intact.
    from carto_etl_spark.sources.csv import read_csv

    big = "x" * (2_500_000)
    p = tmp_path / "wide.csv"
    p.write_text(f"id,blob\n1,{big}\n2,small\n")
    rows = {r["id"]: len(r["blob"]) for r in read_csv(spark, str(p)).collect()}
    assert rows == {"1": 2_500_000, "2": 5}


def test_update_dedup_on_cast_join_key(spark, tmp_path):
    # Distinct raw ids that cast equal ('5' vs '5.0') address the same target
    # row: last occurrence wins and the merge must not fan out the match.
    base = spark.createDataFrame([("5", "orig"), ("6", "keep")], ["id", "v"])
    target = TargetTable(spark, tmp_path / "ck")
    InsertJob(base, spark=spark, target=target, columns="id,v",
              force_no_geometry="true").run()
    upd = tmp_path / "u2.csv"
    upd.write_text("id,v\n5,first\n5.0,second\n")
    UpdateJob("id", str(upd), spark=spark, target=target, columns="id,v",
              force_no_geometry="true").run()
    # 'id' is float-inferred at insert, so the target stores doubles
    rows = sorted((r["id"], r["v"]) for r in target.read().collect())
    assert rows == [(5.0, "second"), (6.0, "keep")]


def test_update_row_range(spark, tmp_path):
    base = spark.createDataFrame(
        [("r1", "a"), ("r2", "b"), ("r3", "c")], ["id", "v"]
    )
    target = TargetTable(spark, tmp_path / "rr")
    InsertJob(base, spark=spark, target=target, columns="id,v",
              force_no_geometry="true").run()
    upd = tmp_path / "u.csv"
    # three update rows; only file row 2 (0-based row 1) should apply
    upd.write_text("id,v\nr1,X1\nr2,X2\nr3,X3\n")
    UpdateJob("id", str(upd), spark=spark, target=target, columns="id,v",
              force_no_geometry="true").run(start_row=2, end_row=2)
    rows = {r["id"]: r["v"] for r in target.read().collect()}
    assert rows == {"r1": "a", "r2": "X2", "r3": "c"}


def test_transform_point_roundtrip(spark):
    df = spark.createDataFrame([(-3.7, 40.4)], ["lon", "lat"])
    pt = point_struct(F.col("lon"), F.col("lat"), 4326)
    merc = transform_point(pt, 4326, 3857)
    back = transform_point(merc, 3857, 4326)
    row = df.select(
        st_x(merc).alias("mx"), st_y(merc).alias("my"),
        st_x(back).alias("lon2"), st_y(back).alias("lat2"),
    ).first()
    # public web-mercator formula values for (-3.7, 40.4)
    assert row["mx"] == pytest.approx(-411882.116, abs=0.01)
    assert row["my"] == pytest.approx(4924240.587, abs=0.01)
    assert row["lon2"] == pytest.approx(-3.7, abs=1e-9)
    assert row["lat2"] == pytest.approx(40.4, abs=1e-9)


def test_transform_point_unsupported_srid():
    # 25830 is ETRS89/UTM — a different datum, which needs a proj shift
    with pytest.raises(ValueError, match="unsupported SRID"):
        transform_point(F.lit(None), 4326, 25830)


def test_utm_roundtrip_and_known_values(spark):
    from carto_etl_spark.functions.geom import transform_geom

    df = spark.createDataFrame(
        [("berlin", 13.4050, 52.5200), ("cntower", -79.387139, 43.642567),
         ("sydney", 151.2153, -33.8568), ("cm", 15.0, 60.0)],
        ["name", "lon", "lat"],
    )
    cases = {"berlin": 32633, "cntower": 32617, "sydney": 32756, "cm": 32633}
    for name, srid in cases.items():
        pt = point_struct(F.col("lon"), F.col("lat"), 4326)
        fwd = transform_point(pt, 4326, srid)
        back = transform_point(fwd, srid, 4326)
        r = df.filter(F.col("name") == name).select(
            st_x(fwd).alias("E"), st_y(fwd).alias("N"),
            st_x(back).alias("lon2"), st_y(back).alias("lat2"), "lon", "lat",
        ).first()
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-6)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-6)
        if name == "cntower":
            # published UTM for the CN Tower: zone 17N 630084 E, 4833438 N
            assert r["E"] == pytest.approx(630084, abs=1.0)
            assert r["N"] == pytest.approx(4833438, abs=1.0)
        if name == "cm":
            # points on the central meridian sit exactly on the false easting
            assert r["E"] == pytest.approx(500000.0, abs=1e-3)

    # cross-zone transform must go through the DataFrame API (flat plans)
    with pytest.raises(ValueError, match="transform_geom"):
        transform_point(F.lit(None), 32633, 32634)
    staged = transform_geom(
        df.select(point_struct(F.col("lon"), F.col("lat"), 4326).alias("g"), "name"),
        "g", 4326, 32633, out_col="utm",
    )
    two_leg = transform_geom(staged, "utm", 32633, 32756, out_col="utm2")
    r = two_leg.filter("name='sydney'").select(
        st_x("utm2").alias("E"), st_y("utm2").alias("N")
    ).first()
    direct = df.filter("name='sydney'").select(
        st_x(transform_point(point_struct(F.col("lon"), F.col("lat"), 4326),
                             4326, 32756)).alias("E")
    ).first()
    # two-leg path accumulates series truncation twice; centimetre agreement
    assert r["E"] == pytest.approx(direct["E"], abs=1e-2)


def test_insert_job_utm_srid_config(spark, tmp_path):
    # config srid accepted end-to-end: x/y given as UTM 33N metres, stored
    # geometry arrives in 4326 (Berlin)
    df = spark.createDataFrame(
        [("1", "391779.26", "5820072.16")], ["id", "lon", "lat"]
    )
    target = TargetTable(spark, tmp_path / "utm")
    InsertJob(df, spark=spark, target=target, columns="id", srid=32633).run()
    g = target.read().select("the_geom").first()["the_geom"]
    assert g["x"] == pytest.approx(13.4050, abs=1e-4)
    assert g["y"] == pytest.approx(52.5200, abs=1e-4)
    assert g["srid"] == 4326


def test_strptime_12_hour_clock(spark):
    assert strptime_to_spark("%d/%m/%Y %I:%M %p") == "d/M/yyyy h:m a"
    df = spark.createDataFrame([("01/09/2017 02:47 PM",)], ["d"])
    ts = timestamp_expr(F.col("d"), "%d/%m/%Y %I:%M %p", "%d/%m/%Y")
    assert str(df.select(ts.alias("t")).first()["t"]) == "2017-09-01 14:47:00"


def test_exact_dedup_subset_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", "p"), (2, "x", "q"), (3, "y", "p")], ["id", "k", "v"]
    )
    assert exact_dedup(df).count() == 3
    assert exact_dedup(df, ["k"]).count() == 2


def test_lsh_hot_bucket_cap(spark):
    """r9 cap + r10 star-pairing: an over-cap bucket contributes only
    star pairs (each member against the bucket's minimum id) instead of
    its full k(k-1)/2 quadratic blow-up — so a genuine mega-cluster of
    identical docs stays CONNECTED through its representative (the r9
    drop let it escape dedup entirely, the r9 ADVICE finding) while the
    pair count stays linear in occupancy."""
    from carto_etl_spark.operators import dedup as dd

    # 40 docs with IDENTICAL text -> every band bucket holds all 40
    same = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)]
    df = spark.createDataFrame(same, "doc_id long, text string")
    sigs = dd.with_minhash(df, "text", 64, 3)
    capped = dd.lsh_candidate_pairs(sigs, "doc_id", bands=32, max_bucket_size=10)
    rows = capped.collect()
    # star shape: exactly the 39 (0, i) edges, est_jaccard 1 on all
    assert len(rows) == 39
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(0, i) for i in range(1, 40)}
    assert all(r["est_jaccard"] == 1.0 for r in rows)
    uncapped = dd.lsh_candidate_pairs(
        sigs, "doc_id", bands=32, max_bucket_size=None
    )
    assert uncapped.count() == 40 * 39 // 2
    # default cap (10k) far above toy occupancy: behavior unchanged
    default = dd.lsh_candidate_pairs(sigs, "doc_id", bands=32)
    assert default.count() == 40 * 39 // 2


def test_minhash_dedup_mega_cluster_collapses(spark):
    """End-to-end guard for the r9 ADVICE finding: a duplicate cluster
    larger than max_bucket_size must still collapse to one survivor —
    star pairs keep it connected, components fold the star.  The cap is
    now a minhash_dedup parameter, so callers can tune it too."""
    from carto_etl_spark.operators import dedup as dd

    same = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)]
    others = [(100 + i, f"unique document number {i} with words w{i} x{i} y{i} z{i}")
              for i in range(5)]
    df = spark.createDataFrame(same + others, "doc_id long, text string")
    out = dd.minhash_dedup(
        df, "doc_id", "text", threshold=0.5, bands=32,
        verify_exact=True, max_bucket_size=10,
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert kept == [0, 100, 101, 102, 103, 104]
