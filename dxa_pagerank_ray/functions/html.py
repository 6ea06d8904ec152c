"""Pinned HTML text/link extraction — the per-row oracle contract.

``extract_text`` / ``extract_links`` are the *single-process oracle*
implementations (pure stdlib, deterministic).  The distributed pipeline
(`pipelines.graph_build`) runs exactly these functions inside
``map_batches`` — the input_hint invariant is that distributed output is
byte-identical per url, which pytest asserts (tests/test_extract.py).

Semantics (pinned; any change is a breaking format version):

- text: all character data in ``<body>``, excluding ``<script>``,
  ``<style>``, ``<noscript>`` and ``<template>`` subtrees, entity
  references decoded; chunks from distinct text nodes are joined with a
  single space and the result whitespace-normalized
  (``" ".join(" ".join(chunks).split())``).
- links: ``href`` of every ``<a>`` in document order, resolved against
  the page url (RFC 3986 join), keeping only http/https targets,
  fragment stripped, scheme/host lowercased, default ports removed,
  empty path canonicalized to ``/``.  Duplicates are preserved here —
  exact dedup is a separate first-class stage (SURVEY.md §2.7).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

_SKIP_TAGS = {"script", "style", "noscript", "template"}
# Void elements never get end tags; do not let them enter the open-tag
# bookkeeping (an unclosed <br> must not eat the rest of the page).
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._in_head = False
        self.chunks: list[str] = []
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "head":
            self._in_head = True
        elif tag == "body":
            # A stray <body> closes any unterminated <head>.
            self._in_head = False
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag == "a":
            for name, val in attrs:
                if name == "href" and val is not None:
                    self.hrefs.append(val)
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        # Self-closing form (<a href=x/>): record href, no skip-depth.
        if tag == "a":
            for name, val in attrs:
                if name == "href" and val is not None:
                    self.hrefs.append(val)
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag == "head":
            self._in_head = False
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if not self._in_head and self._skip_depth == 0 and data:
            self.chunks.append(data)


class _AnchorExtractor(HTMLParser):
    """``(href, anchor text)`` pairs in document order.  Anchor text is
    the whitespace-normalized character data inside the ``<a>`` element
    (same skip-subtree rules as ``extract_text``).  ``<a>`` does not
    nest in HTML — a new ``<a>`` start implicitly closes an open one
    (the HTML5 tree-construction rule)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._href: str | None = None
        self._buf: list[str] = []
        self.anchors: list[tuple[str, str]] = []

    def _flush(self) -> None:
        if self._href is not None:
            self.anchors.append(
                (self._href, " ".join(" ".join(self._buf).split()))
            )
        self._href = None
        self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag == "a":
            self._flush()
            for name, val in attrs:
                if name == "href" and val is not None:
                    self._href = val
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "a":  # self-closing <a/>: empty anchor text
            self.handle_starttag(tag, attrs)
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None and self._skip_depth == 0 and data:
            self._buf.append(data)


def extract_anchor_texts(html: bytes | str,
                         base_url: str) -> list[tuple[str, str]]:
    """``[(target url, anchor text)]`` for every anchor with an
    http(s) target, document order, duplicates preserved — anchor text
    is the classic relevance/label signal for the link target (used by
    web search and as training-data supervision)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _AnchorExtractor()
    p.feed(html)
    p.close()
    p._flush()  # EOF inside an unterminated <a>
    out = []
    for href, text in p.anchors:
        u = normalize_url(href, base_url)
        if u is not None:
            out.append((u, text))
    return out


def _parse(html: bytes | str) -> _Extractor:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    return p


def extract_text(html: bytes | str) -> str:
    """Whitespace-normalized visible text of ``html`` (pinned oracle)."""
    return " ".join(" ".join(_parse(html).chunks).split())


def normalize_url(href: str, base_url: str) -> str | None:
    """Resolve ``href`` against ``base_url`` and normalize, or ``None``
    if the target is not an http(s) url (mailto:, javascript:, etc.)."""
    href = href.strip()
    if not href or href.startswith("#"):
        return None  # fragment-only = intra-page reference, not a link
    try:
        joined = urljoin(base_url, href)
        parts = urlsplit(joined)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def extract_links(html: bytes | str, base_url: str) -> list[str]:
    """Normalized outgoing http(s) link targets in document order
    (duplicates preserved; self-links preserved — dedup is downstream)."""
    out = []
    for href in _parse(html).hrefs:
        u = normalize_url(href, base_url)
        if u is not None:
            out.append(u)
    return out


def extract_text_and_links(html: bytes | str, base_url: str) -> tuple[str, list[str]]:
    """One-parse combined extraction (the hot-path variant used by the
    distributed pipeline; identical output to the two single calls)."""
    p = _parse(html)
    text = " ".join(" ".join(p.chunks).split())
    links = []
    for href in p.hrefs:
        u = normalize_url(href, base_url)
        if u is not None:
            links.append(u)
    return text, links
