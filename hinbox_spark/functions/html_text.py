"""Boilerplate-stripped text extraction — the byte-identical per-url invariant.

Reproduces the observable output of the reference extraction algorithm
(/root/reference/scripts/get_miami_herald_articles.py:219-249, which uses
BeautifulSoup(content, "html.parser")):

  1. container = first of <article>, <div class="article-body">, <main>,
     <div class="container"> — each searched over the whole document in that
     precedence order;
  2. title = first <h1> anywhere, else first <header>; .text.strip()
     (.text = concatenation of all descendant text nodes, no separator);
  3. paragraphs = container.find_all(["p", "div.paragraph"]) — note the
     "div.paragraph" item is a literal (never-matching) tag name in bs4, so
     this is exactly the descendant <p> elements in document order;
  4. content = "\n\n".join(p.text.strip() for p in paragraphs if p.text.strip()
     and not p.text.strip().startswith("Advertisement"));
  5. no <p> descendants → container.get_text(separator="\n\n", strip=True):
     every descendant text node stripped, empties dropped, joined by "\n\n".

bs4 is not available in this environment, so the same semantics are
implemented on the stdlib html.parser building a minimal DOM. The pipeline
calls `extract_series` inside a vectorized pandas UDF (Arrow batches); the
function itself is pure Python per document — HTML parsing is inherently
per-document work and stays off the JVM.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

# Elements that never take content (HTML5 void elements).
_VOID = frozenset(
    ("area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr")
)


class _Node:
    __slots__ = ("tag", "classes", "children")

    def __init__(self, tag: str, classes: tuple[str, ...] = ()):
        self.tag = tag
        self.classes = classes
        self.children: list[object] = []  # _Node | str

    def iter_nodes(self):
        """Descendant elements, document order (self excluded)."""
        for child in self.children:
            if isinstance(child, _Node):
                yield child
                yield from child.iter_nodes()

    def iter_text(self):
        """Descendant text nodes, document order."""
        for child in self.children:
            if isinstance(child, _Node):
                yield from child.iter_text()
            else:
                yield child

    def text(self) -> str:
        return "".join(self.iter_text())

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts = (t.strip() for t in self.iter_text()) if strip else self.iter_text()
        return separator.join(p for p in parts if p) if strip else separator.join(parts)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        classes: tuple[str, ...] = ()
        for k, v in attrs:
            if k == "class" and v:
                classes = tuple(v.split())
        node = _Node(tag, classes)
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self._stack.pop()

    def handle_endtag(self, tag):
        # Close the nearest open element with this tag (tolerant of
        # mis-nesting, like html.parser-backed bs4).
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def _parse(html: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def _find_first(root: _Node, tag: str, cls: str | None = None) -> _Node | None:
    for node in root.iter_nodes():
        if node.tag == tag and (cls is None or cls in node.classes):
            return node
    return None


def extract_title_and_text(html: str) -> tuple[str, str]:
    """Extract (title, content) per the reference algorithm.

    Returns ("", "") when no recognized container exists (the reference
    returns None and the article is skipped).
    """
    root = _parse(html or "")

    container = (
        _find_first(root, "article")
        or _find_first(root, "div", "article-body")
        or _find_first(root, "main")
        or _find_first(root, "div", "container")
    )
    if container is None:
        return "", ""

    title_node = _find_first(root, "h1") or _find_first(root, "header")
    title_text = title_node.text().strip() if title_node is not None else ""

    paragraphs = [n for n in container.iter_nodes() if n.tag == "p"]
    if paragraphs:
        parts = []
        for p in paragraphs:
            t = p.text().strip()
            if t and not t.startswith("Advertisement"):
                parts.append(t)
        content_text = "\n\n".join(parts)
    else:
        content_text = container.get_text(separator="\n\n", strip=True)

    return title_text, content_text


class _StopScan(Exception):
    pass


class _TitleScanner(HTMLParser):
    """Streaming title-only scan, byte-identical to the full parser's title
    rule (`extract_title_and_text`): if the page has no recognized content
    container the title is "" (the full parser skips such pages entirely);
    otherwise the first <h1>'s text wins — even when that text is empty —
    falling back to the first <header> only when NO h1 exists. No DOM is
    built; the scan early-exits once the first h1 has closed AND a
    container has been seen (nothing later can change the answer).

    The scanner keeps the same open-tag stack the tree builder does, so
    mis-nested HTML closes scopes identically: an end tag pops to the
    NEAREST open element of that name, implicitly closing every element
    above it — `<div><h1>T</div>rest` ends the h1 at `</div>` in both
    paths. Duplicate class attributes also mirror the builder: the last
    non-empty `class` attr wins."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._stack: list[str] = []  # open non-void tags, builder order
        self._h1_at: int | None = None      # stack index of the open first-h1
        self._header_at: int | None = None  # stack index of the open first-header
        self.h1_parts: list[str] = []
        self.header_parts: list[str] = []
        self.h1_seen = False  # an h1 existed, even if its text is empty
        self.h1_done = False
        self.header_seen = False
        self.container_seen = False

    def _note_container(self, tag, attrs):
        if tag in ("article", "main"):
            self.container_seen = True
        elif tag == "div":
            # builder semantics: the LAST non-empty class attribute wins
            cls = None
            for k, v in attrs:
                if k == "class" and v:
                    cls = v
            if cls is not None and (
                "article-body" in cls.split() or "container" in cls.split()
            ):
                self.container_seen = True

    def handle_starttag(self, tag, attrs):
        if not self.container_seen:
            self._note_container(tag, attrs)
        if tag not in _VOID:
            self._stack.append(tag)
            if tag == "h1" and not self.h1_done and self._h1_at is None:
                self.h1_seen = True
                self._h1_at = len(self._stack) - 1
            elif (
                tag == "header"
                and not self.header_seen
                and self._h1_at is None
                and self._header_at is None
            ):
                self._header_at = len(self._stack) - 1
    def _close_scopes(self, cut: int) -> None:
        """Scopes opened at stack index ≥ `cut` are now closed."""
        if self._header_at is not None and self._header_at >= cut:
            self._header_at = None
            self.header_seen = True
        if self._h1_at is not None and self._h1_at >= cut:
            self._h1_at = None
            self.h1_done = True
            if self.container_seen:
                raise _StopScan  # first h1 closed + container seen: done

    def handle_endtag(self, tag):
        # mirror the tolerant builder: pop to the nearest open `tag`,
        # implicitly closing everything stacked above it; an end tag with
        # no matching open element is ignored
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i] == tag:
                del self._stack[i:]
                self._close_scopes(i)
                return

    def handle_data(self, data):
        if self._h1_at is not None:
            self.h1_parts.append(data)
        elif self._header_at is not None:
            self.header_parts.append(data)

    def title(self) -> str:
        if not self.container_seen:
            return ""  # full-parser rule: unrecognized page → no title
        if self.h1_seen:
            # an empty first <h1> yields "" — it must NOT fall back to the
            # header (the full parser picks the h1 node regardless)
            return "".join(self.h1_parts).strip()
        return "".join(self.header_parts).strip()


def extract_title(html: str) -> str:
    scanner = _TitleScanner()
    try:
        scanner.feed(html or "")
        scanner.close()
    except _StopScan:
        pass
    return scanner.title()


def extract_title_series(html: pd.Series) -> pd.Series:
    """Vectorized title-only extraction (for rows with pre-extracted text)."""
    out: list[str] = []
    for raw in html:
        if raw is None:
            out.append("")
            continue
        if isinstance(raw, (bytes, bytearray)):
            raw = bytes(raw).decode("utf-8", errors="replace")
        out.append(extract_title(raw))
    return pd.Series(out)


def extract_series(html: pd.Series) -> pd.DataFrame:
    """Vectorized wrapper: Series[bytes|str] → DataFrame(title, text)."""
    titles: list[str] = []
    texts: list[str] = []
    for raw in html:
        if raw is None:
            titles.append("")
            texts.append("")
            continue
        if isinstance(raw, (bytes, bytearray)):
            raw = bytes(raw).decode("utf-8", errors="replace")
        title, text = extract_title_and_text(raw)
        titles.append(title)
        texts.append(text)
    return pd.DataFrame({"title": titles, "text": texts})
