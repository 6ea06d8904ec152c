"""Fast HTML scanner — byte-identical to the pinned HTMLParser oracle.

``functions.html`` defines the extraction semantics via stdlib
``HTMLParser`` (the oracle).  At ~3 MB/s/core that parser is the volume
bottleneck of a web-scale ingest, so this module reimplements exactly
the subset of its event stream the extractor consumes — data chunks,
start/end/startend tags, script/style CDATA handling, tolerant
malformed-input behavior — as a flat scan loop (one ``str.find`` per
construct, attributes parsed only when required), using the stdlib's
own tolerant regexes so edge-case tokenization matches.

Byte-identity is enforced two ways: the corpus test (every fixture
page) and a hypothesis fuzz over adversarial tag soup, both comparing
against the HTMLParser implementation (tests/test_extract_fast.py).
Documents containing ``<![`` marked sections (vanishingly rare in web
text) fall back to the reference parser outright rather than
replicating ``_markupbase`` corner cases.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import (  # the stdlib's own tolerant tokenization
    attrfind_tolerant,
    commentclose,
    endtagfind,
    locatestarttagend_tolerant,
    tagfind_tolerant,
)

_SKIP_TAGS = {"script", "style", "noscript", "template"}
_CDATA_TAGS = {"script", "style"}
_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_ATTR_CONT = frozenset("=\"'")  # tag content that needs the attr loop
_NEXT_INCOMPLETE = frozenset(
    "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)
_SLOW_CHARS = frozenset("=\"'/<\x00")
_NAME_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-.:_"
)
_CDATA_CLOSE = {t: re.compile(r"</\s*%s\s*>" % t, re.I) for t in _CDATA_TAGS}


class _Scan:
    """One document scan; mirrors the extractor-visible behavior of
    ``HTMLParser(convert_charrefs=True)`` + ``functions.html._Extractor``."""

    __slots__ = ("s", "n", "chunks", "hrefs", "skip_depth", "in_head",
                 "cdata_elem", "cdata_close")

    def __init__(self, s: str) -> None:
        self.s = s
        self.n = len(s)
        self.chunks: list[str] = []
        self.hrefs: list[str] = []
        self.skip_depth = 0
        self.in_head = False
        self.cdata_elem: str | None = None
        self.cdata_close: re.Pattern | None = None

    # -- event sinks (the _Extractor state machine) --
    def _data(self, d: str) -> None:
        if d and not self.in_head and self.skip_depth == 0:
            self.chunks.append(d)

    def _data_unescaped(self, d: str) -> None:
        if d:
            self._data(unescape(d) if "&" in d else d)

    def _started(self, tag: str) -> None:
        if tag == "head":
            self.in_head = True
        elif tag == "body":
            self.in_head = False
        if tag in _SKIP_TAGS:
            self.skip_depth += 1

    def _ended(self, tag: str) -> None:
        if tag == "head":
            self.in_head = False
        if tag in _SKIP_TAGS and self.skip_depth > 0:
            self.skip_depth -= 1

    # -- main loop (mirror of HTMLParser.goahead with end=True) --
    def run(self) -> bool:
        """-> False to request the reference-parser fallback."""
        s, n = self.s, self.n
        i = 0
        while i < n:
            if self.cdata_elem is None:
                j = s.find("<", i)
                if j < 0:
                    j = n
                self._data_unescaped(s[i:j])
                i = j
                if i == n:
                    break
            else:
                m = self.cdata_close.search(s, i)
                if not m:
                    return True  # unterminated CDATA content is dropped
                j = m.start()
                self._data(s[i:j])  # raw — no unescape inside CDATA
                i = j

            c = s[i + 1] if i + 1 < n else ""
            if c in _LETTERS:
                k = self._parse_starttag(i)
            elif c == "/":
                k = self._parse_endtag(i)
            elif s.startswith("<!--", i):
                m = commentclose.search(s, i + 4)
                k = m.end() if m else -1
            elif c == "?":
                gt = s.find(">", i + 2)
                k = gt + 1 if gt >= 0 else -1
            elif c == "!":
                # doctype / bogus comment: consume to the next '>'
                gt = s.find(">", i + 2)
                k = gt + 1 if gt >= 0 else -1
            elif i + 1 < n:
                self._data("<")
                i += 1
                continue
            else:
                break

            if k < 0:
                # incomplete construct at EOF: goahead's end=True recovery
                gt = s.find(">", i + 1)
                if gt >= 0:
                    k = gt + 1
                else:
                    lt = s.find("<", i + 1)
                    k = lt if lt >= 0 else i + 1
                if self.cdata_elem is None:
                    self._data_unescaped(s[i:k])
                else:
                    self._data(s[i:k])
            i = k
        if i < n and self.cdata_elem is None:
            self._data_unescaped(s[i:n])  # goahead's end-of-input flush
        return True

    # -- mirror of parse_starttag + check_for_whole_start_tag --
    def _parse_starttag(self, i: int) -> int:
        s = self.s
        # fast path: tag body free of = " ' / < ends at the next '>'
        # (name + bare attribute names only — the tolerant machinery
        # would land exactly there, and bare attrs can't carry an href)
        gt = s.find(">", i + 1)
        if gt > 0:
            body = s[i + 1 : gt]
            if not (_SLOW_CHARS & set(body)):
                # s[i+1] is a letter and the body has no '/', so the
                # tag name is simply the first whitespace-split token
                tag = body.split(None, 1)[0].lower()
                self._started(tag)
                if tag in _CDATA_TAGS:
                    self.cdata_elem = tag
                    self.cdata_close = _CDATA_CLOSE[tag]
                return gt + 1
        m = locatestarttagend_tolerant.match(s, i)
        j = m.end()
        nxt = s[j : j + 1]
        if nxt == ">":
            endpos = j + 1
        elif nxt == "/":
            if s.startswith("/>", j):
                endpos = j + 2
            else:
                endpos = j if j > i else i + 1
        elif nxt == "":
            return -1
        elif nxt in _NEXT_INCOMPLETE:
            return -1
        else:
            endpos = j if j > i else i + 1

        tm = tagfind_tolerant.match(s, i + 1)
        k = tm.end()
        tag = tm.group(1).lower()
        content = s[k:endpos]
        stripped = content.strip()
        need_loop = tag == "a" or bool(_ATTR_CONT & set(content))
        if not need_loop and stripped in (">", "/>"):
            attrs: list = []
            startend = stripped == "/>"
        elif not need_loop and stripped.endswith(">"):
            # bare attribute names only: the tolerant attr loop always
            # consumes these cleanly, so the end-check cannot fail
            attrs = []
            startend = stripped.endswith("/>")
        else:
            attrs = []
            while k < endpos:
                am = attrfind_tolerant.match(s, k)
                if not am:
                    break
                name, rest, value = am.group(1, 2, 3)
                if not rest:
                    value = None
                elif value[:1] == "'" == value[-1:] or \
                        value[:1] == '"' == value[-1:]:
                    value = value[1:-1]
                if value:
                    value = unescape(value)
                attrs.append((name.lower(), value))
                k = am.end()
            end = s[k:endpos].strip()
            if end not in (">", "/>"):
                self._data(s[i:endpos])  # raw, as parse_starttag does
                return endpos
            startend = end.endswith("/>")

        if tag == "a":
            for nm, val in attrs:
                if nm == "href" and val is not None:
                    self.hrefs.append(val)
                    break
        if startend:
            return endpos
        self._started(tag)
        if tag in _CDATA_TAGS:
            self.cdata_elem = tag
            self.cdata_close = _CDATA_CLOSE[tag]
        return endpos

    # -- mirror of parse_endtag --
    def _parse_endtag(self, i: int) -> int:
        s = self.s
        gt = s.find(">", i + 1)
        if gt < 0:
            return -1
        gtpos = gt + 1
        # fast path: '</name>' with a plain name == the strict
        # endtagfind match with no surrounding whitespace
        body = s[i + 2 : gt]
        if body and body[0] in _LETTERS and not (set(body) - _NAME_CHARS):
            elem = body.lower()
            if self.cdata_elem is not None:
                if elem != self.cdata_elem:
                    self._data(s[i:gtpos])
                    return gtpos
                self.cdata_elem = self.cdata_close = None
            self._ended(elem)
            return gtpos
        m = endtagfind.match(s, i)
        if not m:
            if self.cdata_elem is not None:
                self._data(s[i:gtpos])
                return gtpos
            nm = tagfind_tolerant.match(s, i + 2)
            if not nm:
                if s[i : i + 3] == "</>":
                    return i + 3
                pos = s.find(">", i + 2)  # bogus comment: silent consume
                return pos + 1 if pos >= 0 else -1
            tagname = nm.group(1).lower()
            gtpos2 = s.find(">", nm.end())
            self._ended(tagname)
            return gtpos2 + 1
        elem = m.group(1).lower()
        if self.cdata_elem is not None:
            if elem != self.cdata_elem:
                self._data(s[i:gtpos])
                return gtpos
            self.cdata_elem = self.cdata_close = None
        self._ended(elem)
        return gtpos


def fast_text_and_links(html: bytes | str, base_url: str) -> tuple[str, list[str]]:
    """Drop-in fast variant of ``html.extract_text_and_links`` —
    identical output (scanner parity + the same url normalization)."""
    from .html import normalize_url

    text, hrefs = fast_text_and_hrefs(html)
    links = []
    for href in hrefs:
        u = normalize_url(href, base_url)
        if u is not None:
            links.append(u)
    return text, links


def fast_text_and_hrefs(html: bytes | str) -> tuple[str, list[str]]:
    """Whitespace-normalized text + raw hrefs, byte-identical to the
    ``functions.html`` oracle (falls back to it on exotic constructs)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if "<![" in html:
        from .html import _parse  # marked sections: defer to the oracle

        p = _parse(html)
        return " ".join(" ".join(p.chunks).split()), p.hrefs
    sc = _Scan(html)
    sc.run()
    return " ".join(" ".join(sc.chunks).split()), sc.hrefs
