"""HTML main-content extraction: Python spec (extractors/html_strip.py)
and Spark block-table path (operators/html_ops.py) must agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_spark.corpus import make_html
from lens_spark.extractors.html_strip import (
    classify_blocks, html_blocks, strip_html,
)
import random

FIXTURE = """<!DOCTYPE html>
<html><head><title>t</title><script>var x = "<p>not content</p>";</script>
<style>.a{color:red}</style></head>
<body>
<nav><ul><li><a href="/a">alpha</a></li><li><a href="/b">beta</a></li></ul></nav>
<header><a href="/">Home</a> | <a href="/about">About</a></header>
<article>
<h1>Title</h1>
<p>This is the first real paragraph of the article body with plenty of
characters to clear the floor.</p>
<p>See <a href="/ref">the reference</a> for details; this paragraph still
has far more plain text than link text.</p>
<p>short</p>
<p>A closing paragraph that is also long enough to be kept by the
classifier on its own merits.</p>
</article>
<footer><a href="/contact">contact</a> © 2026 corp</footer>
</body></html>"""


def test_blocks_stats():
    blocks = html_blocks(FIXTURE)
    tags = [b.tag for b in blocks]
    assert "li" in tags and "p" in tags and "h1" in tags
    nav_blocks = [b for b in blocks if b.boiler]
    assert nav_blocks, "nav/header/footer blocks must be flagged boiler"
    a_link = [b for b in blocks if b.tag == "li"][0]
    assert a_link.n_link_chars == a_link.n_chars  # pure link text


def test_classify_keeps_body_drops_chrome():
    blocks = html_blocks(FIXTURE)
    keep = classify_blocks(blocks)
    kept = [b.text for b, k in zip(blocks, keep) if k]
    assert any("first real paragraph" in t for t in kept)
    assert any("closing paragraph" in t for t in kept)
    # fusion rescue: "short" sits between two kept paragraphs
    assert "short" in kept
    assert not any("alpha" in t for t in kept)
    assert not any("Home" in t for t in kept)
    assert not any("contact" in t for t in kept)
    # script/style content never leaks
    assert not any("not content" in t for t in kept)


def test_strip_html_fixture_golden():
    got = strip_html(FIXTURE)
    assert got.splitlines()[0].startswith("This is the first real paragraph")
    assert "short" in got.splitlines()
    assert "©" not in got and "alpha" not in got


def test_spark_html_path_matches_python(spark):
    from lens_spark.operators.explode import explode_spans
    from lens_spark.operators.extract import dispatch
    from lens_spark.operators.html_ops import html_extract

    rng = random.Random(7)
    docs = [("h-fix", [("html", FIXTURE, None, 1)])]
    for i in range(12):
        html, _ = make_html(rng, n_paras=rng.randint(1, 5))
        docs.append((f"h-{i:03d}", [("html", html, None, 1)]))

    from lens_spark.schema import DOCUMENTS

    df = spark.createDataFrame(docs, schema=DOCUMENTS)
    branches = dispatch(explode_spans(df))
    got = {
        r["doc_id"]: r["text"]
        for r in html_extract(branches["html"]).collect()
    }
    assert set(got) == {d for d, _ in docs}
    for doc_id, spans in docs:
        expected = strip_html(spans[0][1])
        assert got[doc_id] == expected, f"mismatch for {doc_id}"


def test_generated_page_expectation():
    rng = random.Random(3)
    html, expected = make_html(rng, n_paras=3)
    assert strip_html(html) == expected


def _stdlib_blocks(doc: str):
    """Force the html.parser path (bypass the fast tokenizer)."""
    from lens_spark.extractors.html_strip import _Flattener

    f = _Flattener()
    f.feed(doc or "")
    f.close()
    return [b for b in f.blocks if b.n_chars > 0]


def test_fast_tokenizer_parity():
    """The r06 fast tokenizer must either produce the EXACT html.parser
    event stream or bail to it — so html_blocks output is identical on
    every input, clean or hostile."""
    from lens_spark.extractors.html_strip import _fast_feed, _Flattener

    adversarial = [
        "",
        "plain text no tags",
        "<p>ok</p>",
        "<P>UPPER</P>",
        "<p>self-closed<br/>here</p>",
        "<p>entity &amp; here</p>",          # charref → must bail
        "<p>comment <!-- hidden --> here</p>",  # comment → must bail
        "<?php echo 1 ?><p>pi</p>",          # PI → must bail
        "<p>a < b</p>",                      # bare '<' → bail
        "<p>unclosed",
        "<p><a href='/x'>x</a> tail</p>",
        '<p><a href="/with>gt">x</a></p>',   # '>' inside quotes
        "<script>if (a<b) {}</script><p>body text here ok</p>",  # '<' in cdata
        "<script>var x=1;</script><p>body text here ok</p>",
        "<style>p{color:red}</style><p>body text here ok</p>",
        "<!DOCTYPE html><p>doc</p>",
        "<p attr=unquoted>u</p>",
        "<p a='1' b=\"2\" c>mixed</p>",
        "<div><p>nested <b>bold</b> tail</p></div>",
        "<td>cell</td><li>item</li>",
        "<p>trailing lt <</p>",
        "<p>x</p><",                          # trailing lone '<' → bail
        "</p>stray end</p>",
        "<p/>empty self-close",
        "<nav><a href='/'>l</a></nav><article><p>main content text</p></article>",
    ]
    rng = random.Random(7)
    docs = list(adversarial)
    for i in range(200):
        html, _ = make_html(rng, n_paras=rng.randint(1, 6))
        docs.append(html)
    # mutated/corrupted variants of clean pages exercise the bail path
    for i in range(100):
        html, _ = make_html(rng, n_paras=2)
        cut = rng.randrange(len(html))
        docs.append(html[:cut] + rng.choice(["<", "&x;", "<!--", "<?p", ""])
                    + html[cut:])
    n_fast = 0
    for doc in docs:
        fast = html_blocks(doc)
        slow = _stdlib_blocks(doc)
        assert [
            (b.block_id, b.tag, b.depth, b.text, b.n_chars,
             b.n_link_chars, b.n_tags, b.boiler) for b in fast
        ] == [
            (b.block_id, b.tag, b.depth, b.text, b.n_chars,
             b.n_link_chars, b.n_tags, b.boiler) for b in slow
        ], f"divergence on: {doc[:120]!r}"
        probe = _Flattener()
        if _fast_feed(probe, doc or ""):
            n_fast += 1
    # the fast path must actually engage on the clean corpus
    assert n_fast >= 200, f"fast path engaged on only {n_fast} docs"
