"""HTML-to-text extraction: hand-computed rule pins + plan gate."""

from carto_etl_spark.operators import html as H


def test_extract_hand_case(spark):
    page = (
        "<html><head><title> My &amp; Site </title>"
        "<style>p{color:red}</style></head>"
        "<body><script>var x=1;\nif(x<2){x++}</script>"
        "<h1>Header</h1><!-- secret -->"
        '<p>fish &lt;3 &quot;q&quot; A&amp;B&nbsp;end</p></body></html>'
    )
    df = spark.createDataFrame([(1, page)], "id long, html string")
    r = H.extract(df, "html").collect()[0]
    assert r.title == "My & Site"
    # script body (including the < inside it), style body, and the comment
    # are gone; entities decoded; tags became word boundaries
    assert r.text == 'My & Site Header fish <3 "q" A&B end'
    assert r.n_tags > 0


def test_double_encoded_amp_decodes_one_level(spark):
    # &amp;lt; must become &lt; (literal), NOT < — the single-pass contract
    df = spark.createDataFrame(
        [(1, "<p>&amp;lt;tag&amp;gt;</p>")], "id long, html string"
    )
    assert H.extract(df, "html").collect()[0].text == "&lt;tag&gt;"


def test_missing_title_and_multiline_elements(spark):
    page = "<body><style>\n.a{b:c}\n.d{e:f}\n</style>ok</body>"
    df = spark.createDataFrame([(1, page)], "id long, html string")
    r = H.extract(df, "html").collect()[0]
    assert r.title == ""
    assert r.text == "ok"


def test_plans_no_exchange_no_udf(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "id long, html string")
    plan = (
        H.extract(df, "html")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
