"""HTML main-content extraction (core/htmlpage.py): boilerplate
subtree stripping, link-density and short-block gates, embedded-table
canonicalization, document-order preservation, poison containment."""


def _ex(html, **kw):
    from pdf_table_spark.core.htmlpage import extract_html_page
    return extract_html_page(html, **kw)


PAGE = """<html><head><title>t</title><script>var x=1;</script></head>
<body>
<nav><a href="/">home</a> <a href="/a">alpha page</a></nav>
<header><h1>site banner words here</h1></header>
<main>
<p>the first real paragraph has plenty of words inside it.</p>
<img src="blob://img/1">
<table border="1"><tbody><tr><td>k</td><td>v</td></tr></tbody></table>
<p>the second paragraph follows the table in document order.</p>
<p><a href="/x">one</a> <a href="/y">two</a> <a href="/z">three</a></p>
</main>
<footer>copyright words and <a href="/p">privacy policy link</a></footer>
</body></html>"""


def test_boilerplate_subtrees_dropped():
    frags = _ex(PAGE)
    texts = [f[1] for f in frags if f[0] == "paragraph"]
    joined = " ".join(texts)
    assert "site banner" not in joined          # header stripped
    assert "home" not in joined                 # nav stripped
    assert "copyright" not in joined            # footer stripped
    assert "var x=1" not in joined              # script stripped
    assert "one two three" not in joined        # link-density gate


def test_main_content_order_and_kinds():
    frags = _ex(PAGE)
    kinds = [f[0] for f in frags]
    assert kinds == ["paragraph", "image", "table_html", "paragraph"]
    assert frags[0][1].startswith("the first real paragraph")
    assert frags[1][2] == "blob://img/1"        # img src as media_ref
    assert frags[3][1].startswith("the second paragraph")


def test_embedded_table_canonicalized():
    from pdf_table_spark.core.html import canonicalize_table_html
    frags = _ex(PAGE)
    table = next(f for f in frags if f[0] == "table_html")
    raw = ('<table border="1"><tbody><tr><td>k</td><td>v</td></tr>'
           "</tbody></table>")
    assert table[1] == canonicalize_table_html(raw)


def test_boilerplate_table_dropped():
    html = ("<footer><table><tr><td>sitemap</td></tr></table></footer>"
            "<p>real content paragraph with several words here.</p>")
    frags = _ex(html)
    assert [f[0] for f in frags] == ["paragraph"]


def test_nested_table_stays_one_fragment():
    html = ("<p>intro paragraph with enough words present.</p>"
            "<table><tr><td><table><tr><td>inner</td></tr></table>"
            "</td></tr></table>")
    frags = _ex(html)
    assert [f[0] for f in frags] == ["paragraph", "table_html"]


def test_short_block_and_density_knobs():
    html = "<p>tiny one</p><p>a block of exactly five words</p>"
    assert [f[1] for f in _ex(html)] == ["a block of exactly five words"]
    assert [f[1] for f in _ex(html, min_words=2)] == [
        "tiny one", "a block of exactly five words"]


def test_unclosed_and_nested_boilerplate_degrade_safely():
    # unclosed nav: everything after it drops (counter never pops) —
    # safe (drop, not crash); nested navs pop correctly
    html = ("<nav><nav><a href='/'>x</a></nav></nav>"
            "<p>content survives nested boilerplate blocks fine.</p>"
            "<nav><p>menu words</p>")
    frags = _ex(html)
    assert [f[1] for f in frags] == [
        "content survives nested boilerplate blocks fine."]


def test_entities_and_whitespace_normalized():
    html = "<p>a &amp; b   c\n\n d e f&lt;g</p>"
    assert _ex(html)[0][1] == "a & b c d e f<g"


def test_span_dispatch_routes_html_page():
    from pdf_table_spark.core.page import extract_span
    out = extract_span("html_page", PAGE, "")
    assert [f[0] for f in out] == ["paragraph", "image", "table_html",
                                   "paragraph"]


def test_empty_and_textless_pages():
    assert _ex("") == []
    assert _ex("<nav><a href='/'>only chrome</a></nav>") == []
