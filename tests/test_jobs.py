"""End-to-end job tests on sample01/sample02-shaped CSVs (SURVEY §5 plan):
insert -> target parquet contents, keyed update, keyed delete, chunk ranges,
observer events, dead-letter behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.jobs import (
    DeleteJob,
    InsertJob,
    TargetTable,
    UpdateJob,
)

SAMPLE01 = """a|lat|lon|b|n|fecha
r1|36.5|-4.9|NULL|1.5|01/09/2017 2:47:25
r2|37.2|-5.1|hola 'amigo'|2|01/09/2017
r3|91.0|-4.0|x|bad|zzz
r4||  |vacío||
"""


@pytest.fixture()
def sample_csv(tmp_path):
    p = tmp_path / "sample.csv"
    p.write_text(SAMPLE01, encoding="iso-8859-1")
    return str(p)


def insert_cfg(**kw):
    base = dict(
        delimiter="|",
        file_encoding="iso-8859-1",
        columns="a,lat,lon,b,n,fecha",
        date_columns="fecha",
        date_format="%d/%m/%Y",
        datetime_format="%d/%m/%Y %H:%M:%S",
        x_column="lon",
        y_column="lat",
        srid="4326",
        chunk_size="2",
    )
    base.update(kw)
    return base


def run_insert(spark, sample_csv, tmp_path, **kw):
    target = TargetTable(spark, tmp_path / "target")
    InsertJob(sample_csv, spark=spark, target=target, **insert_cfg(**kw)).run()
    return target


def test_insert_end_to_end(spark, sample_csv, tmp_path):
    target = run_insert(spark, sample_csv, tmp_path)
    rows = {r["a"]: r for r in target.read().collect()}
    assert set(rows) == {"r1", "r2", "r3", "r4"}
    # geometry: valid coords -> struct; out-of-range lat / blank coords -> NULL
    assert rows["r1"]["the_geom"]["x"] == -4.9
    assert rows["r1"]["the_geom"]["srid"] == 4326
    assert rows["r3"]["the_geom"] is None
    assert rows["r4"]["the_geom"] is None
    # literal "NULL" text stays a string; blank stays NULL
    assert rows["r1"]["b"] == "NULL"
    assert rows["r4"]["n"] is None
    # per-column inference: n has "bad" -> string column; lat/lon double
    types = dict(target.read().dtypes)
    assert types["n"] == "string"
    assert types["lat"] == "double"
    # dual-format dates
    assert str(rows["r1"]["fecha"]) == "2017-09-01 02:47:25"
    assert str(rows["r2"]["fecha"]) == "2017-09-01 00:00:00"
    assert rows["r3"]["fecha"] is None


def test_insert_observer_and_chunks(spark, sample_csv, tmp_path):
    events = []
    target = TargetTable(spark, tmp_path / "t2")
    InsertJob(
        sample_csv,
        spark=spark,
        target=target,
        observer=lambda m: events.append(m),
        **insert_cfg(),
    ).run()
    kinds = [e["type"] for e in events]
    assert "total_rows" in kinds and "progress" in kinds


def test_insert_chunk_range(spark, sample_csv, tmp_path):
    # chunk_size=2 -> chunks {1: r1,r2} {2: r3,r4}; documented semantics:
    # start_chunk=2 keeps only the second chunk (README.md:125-126)
    target = TargetTable(spark, tmp_path / "t3")
    InsertJob(
        sample_csv, spark=spark, target=target, **insert_cfg()
    ).run(start_chunk=2)
    got = {r["a"] for r in target.read().collect()}
    assert got == {"r3", "r4"}


def test_update_job(spark, sample_csv, tmp_path):
    target = run_insert(spark, sample_csv, tmp_path)
    upd = tmp_path / "upd.csv"
    upd.write_text("a|b|n\nr2|updated|99\nmissing|zz|1\n")
    UpdateJob(
        "a",
        str(upd),
        spark=spark,
        target=target,
        delimiter="|",
        columns="a,b,n",
    ).run()
    rows = {r["a"]: r for r in target.read().collect()}
    assert rows["r2"]["b"] == "updated"
    assert rows["r2"]["n"] == "99.0"  # update typed double, target string
    assert rows["r1"]["b"] == "NULL"  # untouched
    assert "missing" not in rows  # unmatched update rows dropped
    # geometry survives for untouched rows
    assert rows["r1"]["the_geom"]["y"] == 36.5


def test_update_last_wins(spark, sample_csv, tmp_path):
    target = run_insert(spark, sample_csv, tmp_path)
    upd = tmp_path / "upd2.csv"
    upd.write_text("a|b|n\nr1|first|1\nr1|second|2\n")
    UpdateJob(
        "a", str(upd), spark=spark, target=target, delimiter="|",
        columns="a,b,n",
    ).run()
    rows = {r["a"]: r for r in target.read().collect()}
    assert rows["r1"]["b"] == "second"


def test_delete_job(spark, sample_csv, tmp_path):
    target = run_insert(spark, sample_csv, tmp_path)
    dele = tmp_path / "del.csv"
    dele.write_text("a\nr3\nr4\nnope\n")
    DeleteJob("a", str(dele), spark=spark, target=target, columns="a").run()
    got = {r["a"] for r in target.read().collect()}
    assert got == {"r1", "r2"}


def test_insert_dataframe_source(spark, tmp_path):
    df = spark.createDataFrame(
        [("x1", "1.0", "2.0")], ["A ", "Lon", "LAT"]
    )  # messy headers -> normalized
    target = TargetTable(spark, tmp_path / "t4")
    InsertJob(
        df, spark=spark, target=target, columns="a,lon,lat"
    ).run()
    row = target.read().first()
    assert row["a"] == "x1"
    assert row["the_geom"]["x"] == 1.0


SAMPLE02 = (
    "a,b,c,d,e,f,g,h,i\n"
    "1,2,texto,2016-07-22,sábado,9.07,10,11,12\n"
    "3,4,otro,2016-07-23,domingo,1.5,13,14,15\n"
)


def test_sample02_shape_no_geometry_unlisted_date(spark, tmp_path):
    """SURVEY §5 / FIXTURES §3: comma UTF-8, force_no_geometry, ISO date NOT
    in date_columns -> float parse fails -> stays a STRING column."""
    p = tmp_path / "s02.csv"
    p.write_text(SAMPLE02, encoding="utf-8")
    target = TargetTable(spark, tmp_path / "t02")
    InsertJob(
        str(p), spark=spark, target=target,
        columns="a,b,c,d,e,f,g,h,i", force_no_geometry="true",
    ).run()
    types = dict(target.read().dtypes)
    assert types["d"] == "string"      # unlisted date stays string
    assert types["a"] == "double"      # int -> double coercion
    assert types["f"] == "double"
    rows = {r["a"]: r for r in target.read().collect()}
    assert rows[1.0]["d"] == "2016-07-22"
    assert rows[1.0]["e"] == "sábado"  # UTF-8 survives
    assert rows[1.0]["the_geom"] is None


def test_append_aligns_to_existing_target_schema(spark, tmp_path):
    # batch 1: column n all-numeric -> double; batch 2 contains "bad" ->
    # would infer string; append must align to the target's double (NULL for
    # the bad cell), not write a conflicting parquet schema
    target = TargetTable(spark, tmp_path / "drift")
    b1 = spark.createDataFrame([("r1", "1.5")], ["a", "n"])
    b2 = spark.createDataFrame([("r2", "bad"), ("r3", "2")], ["a", "n"])
    InsertJob(b1, spark=spark, target=target, columns="a,n",
              force_no_geometry="true").run()
    InsertJob(b2, spark=spark, target=target, columns="a,n",
              force_no_geometry="true").run()
    rows = {r["a"]: r["n"] for r in target.read().collect()}
    assert rows == {"r1": 1.5, "r2": None, "r3": 2.0}
    assert dict(target.read().dtypes)["n"] == "double"


def test_parquet_source_format(spark, tmp_path):
    src = tmp_path / "psrc"
    spark.createDataFrame([("x", 1.0)], ["A", "V"]).write.parquet(str(src))
    target = TargetTable(spark, tmp_path / "ptgt")
    InsertJob(str(src), spark=spark, target=target, columns="a,v",
              source_format="parquet", force_no_geometry="true").run()
    row = target.read().first()
    assert row["a"] == "x" and row["v"] == 1.0


def test_declared_column_types_skip_inference(spark, tmp_path):
    # "1.5" would infer double; declaring it string must win (and no
    # inference aggregate runs — the engine fast path for known feeds)
    df = spark.createDataFrame([("1.5", "2")], ["a", "b"])
    target = TargetTable(spark, tmp_path / "tdecl")
    InsertJob(
        df, spark=spark, target=target, columns="a,b",
        column_types="a:string,b:double", force_no_geometry="true",
    ).run()
    types = dict(target.read().dtypes)
    assert types["a"] == "string" and types["b"] == "double"
    row = target.read().first()
    assert row["a"] == "1.5" and row["b"] == 2.0


def test_failed_batch_raises_and_dead_letters(spark, sample_csv, tmp_path):
    class BrokenTarget(TargetTable):
        def append(self, df):
            raise IOError("sink down")

    target = BrokenTarget(spark, tmp_path / "t5")
    job = InsertJob(
        sample_csv, spark=spark, target=target, max_attempts="2", **{
            k: v for k, v in insert_cfg().items() if k != "chunk_size"
        },
    )
    with pytest.raises(RuntimeError):
        job.run()
    assert len(job.dead_letters) == 1

    # skip_failed_batches=True -> reference behavior: continue past failure
    job2 = InsertJob(
        sample_csv, spark=spark, target=target, max_attempts="2",
        skip_failed_batches="true", **{
            k: v for k, v in insert_cfg().items() if k != "chunk_size"
        },
    )
    job2.run()
    assert len(job2.dead_letters) == 1


def test_source_column_named_the_geom_does_not_break_coercion(spark, tmp_path):
    """A projected source column literally named 'the_geom' (without
    force_the_geom) must not resolve to the generated geometry struct inside
    the string-coercion branch — the generated geometry wins the output slot."""
    df = spark.createDataFrame(
        [("1.0", "2.0", "junk")], ["lon", "lat", "the_geom"]
    )
    target = TargetTable(spark, tmp_path / "t")
    job = InsertJob(
        df, target=target, columns="lon,lat,the_geom", srid="4326"
    )
    out = job.run()
    row = out.collect()[0]
    assert row["the_geom"] is not None
    assert row["the_geom"]["x"] == 1.0  # generated struct, not 'junk'


def test_staging_temp_names_survive_column_collision(spark):
    """Source columns that collide with internal staging temp names must pass
    through unscathed."""
    from carto_etl_spark.config import JobConfig
    from carto_etl_spark.functions.geom import staged_geom

    df = spark.createDataFrame(
        [("3.0", "4.0", "keepme", "metoo")],
        ["lon", "lat", "__the_geom_px", "__xf_the_geom"],
    )
    cfg = JobConfig.from_kwargs(srid=32630)  # UTM: exercises transform_geom
    out = staged_geom(df, cfg)
    row = out.collect()[0]
    assert row["__the_geom_px"] == "keepme"
    assert row["__xf_the_geom"] == "metoo"
    assert row["the_geom"] is not None
