"""Byte-identical text extraction invariant (T1).

Exercises every branch of the reference algorithm
(/root/reference/scripts/get_miami_herald_articles.py:219-249): container
precedence, h1/header title, paragraph join rules, Advertisement drop,
empty-paragraph drop, and the get_text fallback.
"""

import pandas as pd

from hinbox_spark.functions.html_text import extract_series, extract_title_and_text


def test_article_container_with_paragraphs():
    html = (
        "<html><body><h1> Big News </h1>"
        "<article><p>First para.</p><p>  </p>"
        "<p>Advertisement - buy now</p><p>Second para.</p></article>"
        "</body></html>"
    )
    title, text = extract_title_and_text(html)
    assert title == "Big News"
    assert text == "First para.\n\nSecond para."


def test_container_precedence_article_first():
    html = (
        "<div class='article-body'><p>From div.</p></div>"
        "<article><p>From article.</p></article>"
    )
    _, text = extract_title_and_text(html)
    # <article> wins even though it appears later in the document
    assert text == "From article."


def test_article_body_div():
    html = "<div class='article-body extra'><p>Body text.</p></div>"
    _, text = extract_title_and_text(html)
    assert text == "Body text."


def test_main_container():
    html = "<main><p>Main text.</p></main>"
    _, text = extract_title_and_text(html)
    assert text == "Main text."


def test_container_div():
    html = "<div class='container'><p>Container text.</p></div>"
    _, text = extract_title_and_text(html)
    assert text == "Container text."


def test_no_container_returns_empty():
    html = "<div class='other'><p>Orphan.</p></div>"
    title, text = extract_title_and_text(html)
    assert title == "" and text == ""


def test_header_title_fallback():
    html = "<header>Header Title</header><article><p>X.</p></article>"
    title, _ = extract_title_and_text(html)
    assert title == "Header Title"


def test_h1_beats_header():
    html = "<header>H</header><h1>Real Title</h1><article><p>X.</p></article>"
    title, _ = extract_title_and_text(html)
    assert title == "Real Title"


def test_no_paragraph_fallback_get_text():
    html = "<article><div>Line one</div><div>  Line two  </div></article>"
    _, text = extract_title_and_text(html)
    # get_text(separator="\n\n", strip=True): strip each text node, drop
    # empties, join with \n\n
    assert text == "Line one\n\nLine two"


def test_nested_markup_inside_paragraph():
    html = "<article><p>Hello <b>bold</b> world &amp; more.</p></article>"
    _, text = extract_title_and_text(html)
    assert text == "Hello bold world & more."


def test_paragraph_inside_nested_div():
    html = "<article><div><div><p>Deep para.</p></div></div></article>"
    _, text = extract_title_and_text(html)
    assert text == "Deep para."


def test_vectorized_series_with_bytes():
    htmls = pd.Series(
        [
            b"<article><h1>T</h1><p>A.</p></article>",
            None,
            "<main><p>B.</p></main>",
        ]
    )
    out = extract_series(htmls)
    assert list(out["text"]) == ["A.", "", "B."]
    assert out["title"][0] == "T"


def test_title_scanner_matches_full_parse_on_corpus():
    """extract_title (streaming, early-exit) must agree with the full-parse
    title on every synthetic corpus page that has a recognized container —
    the invariant that makes the pre-extracted-text fast path safe."""
    from hinbox_spark.functions.html_text import extract_title
    from hinbox_spark.sources.pages_gen import page_record

    checked = 0
    for i in range(120):
        row, _ = page_record(i, seed=7)
        html = row["html"].decode()
        full_title, full_text = extract_title_and_text(html)
        if not full_text:
            continue  # no container → page is dropped either way
        assert extract_title(html) == full_title
        checked += 1
    assert checked > 80


def test_title_scanner_h1_precedence_and_header_fallback():
    from hinbox_spark.functions.html_text import extract_title

    # first h1 wins over later h1s and over header (inside a container —
    # container-less pages yield "" per the full-parser rule, tested below)
    assert extract_title(
        "<main><header>H</header><h1>One</h1><h1>Two</h1></main>"
    ) == "One"
    assert extract_title(
        "<main><header>Head <b>er</b></header><p>x</p></main>"
    ) == "Head er"
    assert extract_title("<main><p>no title</p></main>") == ""
    assert extract_title("<p>no title, no container</p>") == ""
    assert extract_title(None) == ""


def test_title_fast_path_matches_full_parser_on_edge_cases():
    """The streaming title scanner must agree with the full parser's title
    rule byte-for-byte (ADVICE r2): empty first <h1> suppresses the header
    fallback, and pages without a recognized container get '' — never a
    title the full parser would not have produced."""
    from hinbox_spark.functions.html_text import extract_title

    cases = [
        # empty first h1: '' — must NOT fall back to <header>
        "<article><h1></h1><header>Header Title</header><p>x</p></article>",
        # no recognized container: full parser skips the page → ''
        "<div><h1>Real Title</h1><p>text</p></div>",
        # header fallback only when no h1 exists at all
        "<article><header>Only Header</header><p>x</p></article>",
        # no title elements at all
        "<main><p>no title here</p></main>",
        # h1 after the container closes still wins (document-order search)
        "<article><p>text</p></article><h1>Late H1</h1>",
        # h1 before the container
        "<h1>Early H1</h1><article><p>t</p></article>",
        # h1 nested inside header
        "<article><header><h1>Nested</h1></header><p>t</p></article>",
        # div.container variant
        '<div class="container"><h1>Contained</h1><p>t</p></div>',
        # whitespace-only h1
        "<article><h1>   </h1><header>H</header><p>t</p></article>",
    ]
    for html in cases:
        full_title, _ = extract_title_and_text(html)
        assert extract_title(html) == full_title, html


def test_title_fast_path_matches_full_parser_on_misnested_html():
    """ADVICE r3 (medium): the tolerant full parser implicitly closes an
    open <h1>/<header> when a parent's end tag arrives; the scanner must
    mirror that (stack-based pop-to-nearest), and duplicate class
    attributes must resolve like the tree builder (last non-empty wins).
    Every case here diverged — or guards a neighbor that did — before the
    scanner kept the builder's open-tag stack."""
    from hinbox_spark.functions.html_text import extract_title

    cases = [
        # </div> implicitly closes the open h1 → title 'T', not 'Trest...'
        "<article><div><h1>T</div>rest of page</article>",
        # same for header
        "<article><div><header>H</div>tail</article>",
        # </p> implicitly closes the h1
        "<main><p><h1>T</p>tail</main>",
        # end tag with no matching open element is ignored by both paths
        "<article><header>H</div>rest</article>",
        # duplicate class attrs: LAST non-empty wins (is a container here...)
        '<article2><div class="x" class="container">c<h1>T</h1></div>',
        # ...and is NOT a container here (page unrecognized → '')
        '<div class="container" class="x">c<h1>T</h1></div>',
        # an empty later class attr does not clear an earlier container one
        '<div class="container" class="">c<h1>T</h1></div>',
        # nested h1: inner end tag must not close the outer scope
        "<h1>A<h1>B</h1>C</h1><article>x</article>",
        # nested header, same rule
        "<header>A<header>B</header>C</header><main>m</main>",
        # self-closing h1 yields an (empty) h1 node in both paths
        "<main><h1/>after</main>",
    ]
    for html in cases:
        full_title, _ = extract_title_and_text(html)
        assert extract_title(html) == full_title, html


def test_title_fast_path_fuzz_matches_full_parser():
    """Randomized tag soup (fixed seed): the streaming scanner and the
    full parser must produce the same title on every mis-nested input."""
    import random

    from hinbox_spark.functions.html_text import extract_title

    rng = random.Random(1234)
    tokens = [
        "<article>", "</article>", "<div>", "</div>",
        '<div class="container">', '<div class="x" class="article-body">',
        '<div class="container" class="y">', "<h1>", "</h1>", "<header>",
        "</header>", "<main>", "</main>", "<p>", "</p>", "<br>", "<span>",
        "</span>", "text ", "T1 ", "word ",
    ]
    for _ in range(800):
        html = "".join(rng.choice(tokens) for _ in range(rng.randint(3, 25)))
        full_title, _ = extract_title_and_text(html)
        assert extract_title(html) == full_title, html
