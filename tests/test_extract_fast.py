"""Fast scanner vs the pinned HTMLParser oracle — byte identity on the
fixture corpus and under adversarial fuzz (the fast path is only valid
while these hold)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dxa_pagerank_ray.functions.html import _parse
from dxa_pagerank_ray.functions.html_fast import fast_text_and_hrefs
from dxa_pagerank_ray.sources.pages import pages_table


def _oracle(html) -> tuple[str, list[str]]:
    p = _parse(html)
    return " ".join(" ".join(p.chunks).split()), p.hrefs


def test_fast_matches_oracle_on_corpus():
    for seed, n in [(42, 64), (11, 200), (7, 100)]:
        t = pages_table(n, seed=seed)
        for h in t["html"]:
            b = h.as_py()
            assert fast_text_and_hrefs(b) == _oracle(b)


EDGE_CASES = [
    b"",
    b"plain, no tags at all",
    b"a < b > c and a<3 and b<=4",
    b"x<",
    b"t<b",
    b"<a href=x",
    b"x<!--never closed",
    b"<script>var x = '<div>' + 1 < 2;</script>after",
    b"<script>never closed",
    b"<SCRIPT>UP</script>q",
    b"<style>p{}</STYLE>q",
    b"<script/>not cdata</p>",
    b"<head><title>T</title><p>in head<body>visible",
    b"<head/>x",
    b"<noscript><p>hidden</p></noscript>shown",
    b"<template><b>t</b></template>u",
    b'<a href="/x">r</a><a href=\'y\'>s</a><a href=bare>t</a><a href>u</a>',
    b'<a href="u&amp;v">t</a>',
    b"<a\nhref\n=\nv>t",
    b"<a/href=x>t",
    b'<p a=1 b="2>3">t',
    b"</>x</ weird>y</p extra='1'>z",
    b"<1>y<?pi?>z<!doctype html>w<!>v",
    b"a&amp;b &unknown; &#65; &#x42; &#65 incomplete &am",
    b"<p>unclosed <b>bold",
    b"<div  \t class=x   >spaces</div>",
    b"<a href='u'><a href='w'>nested</a></a>",
    b"text &lt;tag&gt; more",
    b"<script>a</script x></script>b",
    b"<p>a\xffb</p>",  # invalid utf-8
]


def test_fast_matches_oracle_on_edge_cases():
    for case in EDGE_CASES:
        assert fast_text_and_hrefs(case) == _oracle(case), case


_SOUP = st.lists(
    st.one_of(
        st.sampled_from([
            "<", ">", "</", "/>", "<!--", "-->", "<!", "<?", "&", ";",
            "&amp;", "&#65;", "&bogus", "'", '"', "=", " ", "\n", "/",
            "<a>", "</a>", "<a href=", "<p>", "</p>", "<script>",
            "</script>", "<style>", "</style>", "<head>", "</head>",
            "<body>", "<noscript>", "</noscript>", "href", "x1", "tAg",
        ]),
        st.text(
            alphabet="abz<>&;='\"/ \n\t-!?#ABZ09",
            min_size=0, max_size=12,
        ),
    ),
    min_size=0, max_size=30,
).map("".join)


@settings(max_examples=2000, deadline=None)
@given(_SOUP)
def test_fast_matches_oracle_fuzz(s):
    assert fast_text_and_hrefs(s) == _oracle(s)
