"""Markdown → HTML5 → blocks (markdownToHtml.ts + htmlTransformer.ts)."""

from decisions_knowledge_graph_data_spark.operators.markdown import (
    html_to_blocks,
    md_to_blocks,
    md_to_html,
    md_to_html_py,
)

FIXTURE_MD = """# Title One

First paragraph with **bold** and *em* and `code`.
Continuation line of the same paragraph.

## Section

- alpha
- beta

1. first
2. second

> quoted holding

---

Tail paragraph with 5 < 6 & more.
"""


def test_md_to_html_constructs():
    html = md_to_html_py(FIXTURE_MD)
    assert "<h1>Title One</h1>" in html
    assert "<h2>Section</h2>" in html
    assert "<strong>bold</strong>" in html and "<em>em</em>" in html
    assert "<code>code</code>" in html
    assert "First paragraph" in html and "Continuation line" in html
    # the two paragraph lines merge into ONE <p>
    assert html.count("<p>First paragraph") == 1
    assert "<ul>\n<li>alpha</li>\n<li>beta</li>\n</ul>" in html
    assert "<ol>\n<li>first</li>\n<li>second</li>\n</ol>" in html
    assert "<blockquote>quoted holding</blockquote>" in html
    assert "<hr/>" in html
    assert "5 &lt; 6 &amp; more" in html  # escaping
    assert md_to_html_py("") == ""
    assert md_to_html_py(None) == ""


def test_md_to_blocks_numbering(spark):
    df = spark.createDataFrame([("d1", FIXTURE_MD), ("d2", "# Only\n\n")],
                               "doc_id string, content_md string")
    got = md_to_blocks(df).toPandas().sort_values(["doc_id", "block_num"])
    d1 = got[got["doc_id"] == "d1"]
    # h1, p, h2, li, li, li, li, blockquote, p  (hr and ul/ol wrappers are
    # not content blocks)
    assert list(d1["element_type"]) == [
        "h1", "p", "h2", "li", "li", "li", "li", "blockquote", "p",
    ]
    assert list(d1["block_num"]) == list(range(1, 10))
    assert list(d1["block_id"])[:2] == ["d1:block-001", "d1:block-002"]
    assert (d1["char_count"] > 0).all()
    # tags are stripped from plain_text
    assert not d1["plain_text"].str.contains("<").any()
    d2 = got[got["doc_id"] == "d2"]
    assert list(d2["element_type"]) == ["h1"]


def test_html_to_blocks_skips_empties(spark):
    df = spark.createDataFrame(
        [("x", "<h1>A</h1>\n<p></p>\n<p>B</p>")], "doc_id string, html string"
    )
    got = html_to_blocks(df).toPandas()
    # the empty <p></p> is skipped and numbering stays dense
    assert list(got["block_num"]) == [1, 2]
    assert list(got["plain_text"]) == ["A", "B"]


def test_md_kernel_matches_pure_python(spark):
    df = spark.createDataFrame(
        [(str(i), f"# H{i}\n\npara {i} **x**\n\n- a\n- b") for i in range(50)],
        "doc_id string, content_md string",
    )
    got = {r["doc_id"]: r["html"]
           for r in md_to_html(df, "content_md").collect()}
    for i in range(50):
        assert got[str(i)] == md_to_html_py(f"# H{i}\n\npara {i} **x**\n\n- a\n- b")
