"""CLI driver: the reference's operating model (etl.conf + action verb)."""

from __future__ import annotations

import pytest

from carto_etl_spark.cli import load_conf, main

CONF = """
[carto]
base_url=https://ignored.example.com/
api_key=IGNORED
table_name=obs
delimiter=|
columns=a,lat,lon,b
x_column=lon
y_column=lat
srid=4326

[etl]
chunk_size=2
max_attempts=3
"""


@pytest.fixture()
def workspace(tmp_path, spark):
    (tmp_path / "etl.conf").write_text(CONF)
    (tmp_path / "data.csv").write_text(
        "a|lat|lon|b\nr1|36.5|-4.9|uno\nr2|37.2|-5.1|dos\nr3|91|-4|tres\n"
    )
    (tmp_path / "del.csv").write_text("a\nr3\n")
    return tmp_path


def test_load_conf_flattens_sections(workspace):
    kwargs = load_conf(str(workspace / "etl.conf"))
    assert kwargs["table_name"] == "obs"
    assert kwargs["chunk_size"] == "2"  # string; JobConfig coerces


def test_cli_insert_then_delete(workspace, spark):
    target = str(workspace / "target")
    rc = main([
        "insert", "--conf", str(workspace / "etl.conf"),
        "--csv", str(workspace / "data.csv"), "--target", target,
    ])
    assert rc == 0
    assert spark.read.parquet(target).count() == 3
    rc = main([
        "delete", "--conf", str(workspace / "etl.conf"),
        "--csv", str(workspace / "del.csv"), "--target", target,
        "--id-column", "a",
    ])
    assert rc == 0
    assert {r["a"] for r in spark.read.parquet(target).collect()} == {"r1", "r2"}


def test_cli_transactional_target(workspace, spark):
    from carto_etl_spark.operators.transactional import TransactionalTable

    target = str(workspace / "txn")
    rc = main([
        "insert", "--conf", str(workspace / "etl.conf"),
        "--csv", str(workspace / "data.csv"), "--target", target,
        "--transactional",
    ])
    assert rc == 0
    t = TransactionalTable(spark, target)
    assert t.version() == 1
    assert t.read().count() == 3


def test_cli_query_verb_roundtrip(workspace, spark, capsys):
    # insert, then run SQL over the target via the query verb: to stdout
    # and to a csv output directory
    target = str(workspace / "qt")
    assert main([
        "insert", "--conf", str(workspace / "etl.conf"),
        "--csv", str(workspace / "data.csv"), "--target", target,
    ]) == 0
    capsys.readouterr()  # drop the insert verb's completion line
    rc = main([
        "query", "--table", f"obs={target}",
        "--sql", "SELECT a FROM obs WHERE b = 'uno'",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "r1"

    out = str(workspace / "qout")
    rc = main([
        "query", "--table", f"obs={target}", "--target", out,
        "--sql", "SELECT a, b FROM obs ORDER BY a",
    ])
    assert rc == 0
    got = spark.read.option("header", True).csv(out).orderBy("a").collect()
    assert [(r["a"], r["b"]) for r in got] == [
        ("r1", "uno"), ("r2", "dos"), ("r3", "tres")
    ]


def test_cli_query_registers_csv_and_validates(workspace, capsys):
    rc = main([
        "query", "--table", f"raw={workspace / 'data.csv'}",
        "--sql", "SELECT count(*) FROM raw",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "3"
    assert main(["query", "--table", "bad-spec",
                 "--sql", "SELECT 1"]) == 2
    assert main(["query"]) == 2          # no sql
    assert main(["insert"]) == 2         # DML without --target


def test_cli_query_explain(workspace, capsys):
    rc = main([
        "query", "--table", f"raw={workspace / 'data.csv'}",
        "--sql", "SELECT count(*) FROM raw", "--explain",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan csv" in out


def test_cli_requires_id_column_for_update(workspace):
    rc = main([
        "update", "--conf", str(workspace / "etl.conf"),
        "--csv", str(workspace / "data.csv"),
        "--target", str(workspace / "t2"),
    ])
    assert rc == 2


def test_cli_profile_verb(workspace, spark, capsys):
    # land a table first, then profile it
    assert main([
        "insert", "--conf", str(workspace / "etl.conf"),
        "--csv", str(workspace / "data.csv"),
        "--target", str(workspace / "ptab"),
    ]) == 0
    capsys.readouterr()
    rc = main(["profile", "--target", str(workspace / "ptab")])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert out[0].split("\t") == [
        "column", "rows", "nulls", "distinct", "min", "max"
    ]
    by_col = {line.split("\t")[0]: line.split("\t") for line in out[1:]}
    assert by_col["a"][1] == "3" and by_col["a"][3] == "3"


def test_cli_profile_requires_path(capsys):
    assert main(["profile"]) == 2


def test_cli_shuffle_verb(workspace, spark, capsys, tmp_path):
    import hashlib

    src = str(tmp_path / "docs")
    out = str(tmp_path / "shuffled")
    spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id long, text string"
    ).write.parquet(src)
    rc = main([
        "shuffle", "--target", src, "--out", out,
        "--id-column", "doc_id", "--shards", "4", "--seed", "7",
    ])
    assert rc == 0
    assert "50 rows in 4 shards" in capsys.readouterr().out
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 50 and {r.text for r in rows} == {
        f"text {i}" for i in range(50)
    }
    # assignment matches the operator's md5 contract
    for r in rows:
        h = hashlib.md5(f"7:{r.doc_id}".encode()).hexdigest()
        assert r.shard == int(h[:8], 16) * 4 // 2 ** 32


def test_cli_shuffle_requires_args(capsys):
    assert main(["shuffle", "--target", "/nope"]) == 2
