"""Unit tests for the HTML/markup -> text extraction front door
(operators/text.py html_to_text — the round-9 LLM-tier addition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.operators import text


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(0, html)], "doc_id BIGINT, html STRING")
    return text.extract_html_text(df).collect()[0]["text"]


def test_html_strip_blocks_and_inline(spark):
    html = (
        "<html><head><title>T</title>"
        "<style>body { color: red; }</style>"
        '<script>if (1 < 2) { x = "y"; }</script></head>'
        "<body><h1>Head</h1><p>Tom &amp; Jerry &lt;3</p>"
        "<div>a<b>b</b>c</div><ul><li>one</li><li>two</li></ul>"
        "<!-- hidden --></body></html>"
    )
    assert _extract(spark, html) == "T\nHead\nTom & Jerry <3\nabc\none\ntwo"


def test_html_entity_decode_order_and_unknowns(spark):
    # &amp; decodes LAST: "&amp;lt;" must yield the literal "&lt;", not "<"
    assert _extract(spark, "<p>&amp;lt;</p>") == "&lt;"
    # unknown entities pass through untouched
    assert _extract(spark, "<p>&copy; 2026</p>") == "&copy; 2026"
    # nbsp becomes a collapsible space
    assert _extract(spark, "<p>a&nbsp;&nbsp;b</p>") == "a b"
    assert _extract(spark, "<p>&quot;q&quot; &#39;n &apos;t</p>") == "\"q\" 'n 't"


def test_html_script_content_never_leaks(spark):
    html = (
        "<p>before</p><script type='x'>\nsecret < tokens > here\n</script>"
        "<p>after</p>"
    )
    out = _extract(spark, html)
    assert "secret" not in out
    assert out == "before\nafter"


def test_html_whitespace_normalization(spark):
    html = "<div>  a\t b </div>\r\n\r\n<div>c</div><br><br><br><div> d</div>"
    assert _extract(spark, html) == "a b\nc\nd"


def test_html_plain_text_passthrough(spark):
    # markup-free text survives with whitespace normalized only
    assert _extract(spark, "just words, no tags") == "just words, no tags"


def test_html_case_insensitive_tags(spark):
    assert _extract(spark, "<P>a</P><SCRIPT>x=1</SCRIPT><DiV>b</DiV>") == "a\nb"


def test_html_oracle_sql_matches_spark(spark):
    """The compiled DuckDB expression replays the Spark chain verbatim on
    an adversarial snippet (the differential gate does this corpus-wide;
    this is the fast inner loop)."""
    import duckdb

    from gcp_etl_pipeline_spark.operators.curation_queries import (
        _html_to_text_sql,
    )

    snippets = [
        "<p>Tom &amp; Jerry &lt;3&nbsp;&quot;q&quot; &#39;n</p>",
        "<ul><li>one</li><li>two</li></ul><!-- c --><i>x</i>",
        "<script>1 < 2 && 3 > 0</script><h2>T</h2>",
        "no tags at   all",
        "<td>a</td><TR>b</TR>\n\n<pre>keep</pre>",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(snippets)], "doc_id BIGINT, html STRING"
    )
    got_spark = {
        r["doc_id"]: r["text"] for r in text.extract_html_text(df).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(snippets):
        lit = "'" + s.replace("'", "''") + "'"
        got_duck = con.execute(
            "SELECT " + _html_to_text_sql(lit)
        ).fetchone()[0]
        assert got_spark[i] == got_duck, (i, got_spark[i], got_duck)


def test_html_link_extract_order_and_no_links(spark):
    from gcp_etl_pipeline_spark.operators.curation_queries import _HREF_RE

    df = spark.createDataFrame(
        [
            (1, '<a href="u1">x</a><p>t</p><a class="c" href="u2">y</a>'),
            (2, "<p>no links at all</p>"),
        ],
        "doc_id BIGINT, html STRING",
    )
    rows = df.select(
        "doc_id",
        F.expr(f"regexp_extract_all(html, '{_HREF_RE}', 1)").alias("h"),
    ).collect()
    by = {r["doc_id"]: r["h"] for r in rows}
    assert by[1] == ["u1", "u2"]  # document order preserved
    assert by[2] == []


def test_normalize_url_rules(spark):
    cases = {
        "HTTP://Ex.ORG:80/a/": "http://ex.org/a",
        "https://ex.org:443/a#frag": "https://ex.org/a",
        "https://ex.org:8443/a": "https://ex.org:8443/a",  # non-default kept
        "http://ex.org:443/a": "http://ex.org:443/a",      # wrong-scheme port kept
        "http://EX.org/A/B//": "http://ex.org/A/B",        # path case preserved
        "http://ex.org": "http://ex.org",
    }
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases.items())],
        "i BIGINT, u STRING",
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", text.normalize_url("u").alias("n")).collect()
    }
    for i, (_, want) in enumerate(cases.items()):
        assert got[i] == want, (i, got[i], want)
