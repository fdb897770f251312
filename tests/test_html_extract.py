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


def _hrefs(spark, html: str) -> list:
    from gcp_etl_pipeline_spark.operators.curation_queries import (
        _HREF_RE_DQ,
        _HREF_RE_SQ,
    )

    df = spark.createDataFrame([(html,)], "html STRING")
    return df.select(
        F.concat(
            F.regexp_extract_all("html", F.lit(_HREF_RE_DQ), F.lit(1)),
            F.regexp_extract_all("html", F.lit(_HREF_RE_SQ), F.lit(1)),
        ).alias("h")
    ).collect()[0]["h"]


def test_html_link_extract_order_and_no_links(spark):
    assert _hrefs(
        spark, '<a href="u1">x</a><p>t</p><a class="c" href="u2">y</a>'
    ) == ["u1", "u2"]
    assert _hrefs(spark, "<p>no links at all</p>") == []


def test_html_link_extract_tag_and_attr_discipline(spark):
    # tag must be exactly <a>, attribute must be exactly href
    assert _hrefs(spark, '<audio href="x.mp3">t</audio>') == []
    assert _hrefs(spark, '<abbr href="x">t</abbr>') == []
    assert _hrefs(spark, '<a data-href="track.js">x</a>') == []
    # case-insensitive and single-quoted forms ARE harvested
    assert _hrefs(spark, '<A HREF="u">x</A>') == ["u"]
    assert _hrefs(spark, "<a href='u'>x</a>") == ["u"]
    assert _hrefs(spark, '<a href = "u">x</a>') == ["u"]
    # first real href wins when a decoy attribute follows
    assert _hrefs(spark, '<a href="u1" data-href="u2">x</a>') == ["u1"]


def test_html_unterminated_script_never_leaks(spark):
    # a fetch truncated mid-script must not leak the body into clean text
    out = _extract(spark, '<p>hi</p><script>var k = "SECRET";')
    assert "SECRET" not in out
    assert out == "hi"
    out2 = _extract(spark, "<p>a</p><style>body { color: red }")
    assert out2 == "a"
    out3 = _extract(spark, "<p>a</p><!-- dangling comment")
    assert out3 == "a"


def test_normalize_url_preserves_query_slashes(spark):
    cases = {
        "https://ex.org/search?path=/docs/": "https://ex.org/search?path=/docs/",
        "http://Ex.org/a/?q=1": "http://ex.org/a?q=1",
        "http://ex.org/r?to=/": "http://ex.org/r?to=/",
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


def test_line_boilerplate_removal(spark):
    from gcp_etl_pipeline_spark.operators import dedup

    rows = [(i, f"NAV | home\ncontent {i}\nfooter (c) corp") for i in range(12)]
    rows.append((12, "NAV | home\nfooter (c) corp"))  # chrome-only page
    rows.append((13, "entirely unique page"))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {
        r["doc_id"]: r
        for r in dedup.line_boilerplate_removal(docs, min_df=10).collect()
    }
    assert len(out) == 14  # every doc present, including the emptied one
    for i in range(12):
        assert out[i]["n_lines"] == 3
        assert out[i]["removed_lines"] == 2
        assert out[i]["clean_text"] == f"content {i}"
    assert out[12]["removed_lines"] == 2 and out[12]["clean_text"] == ""
    assert out[13]["removed_lines"] == 0
    assert out[13]["clean_text"] == "entirely unique page"


def test_line_boilerplate_keeps_order(spark):
    from gcp_etl_pipeline_spark.operators import dedup

    rows = [(i, f"BP\nz{i} last\nBP\na{i} first") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {
        r["doc_id"]: r
        for r in dedup.line_boilerplate_removal(docs, min_df=10).collect()
    }
    # document order preserved (not lexicographic)
    assert out[3]["clean_text"] == "z3 last\na3 first"
    assert out[3]["removed_lines"] == 2
