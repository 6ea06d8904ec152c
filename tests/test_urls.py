"""functions/urls.py — the shared-RE2-rule URL canonicalizer."""
import duckdb
import pyarrow as pa

from dxa_pagerank_ray.functions.urls import (
    CANON_RULES,
    canonicalize_sql,
    canonicalize_urls,
)

CASES = [
    # (raw, canonical)
    ("https://Site0.EXAMPLE/p/0#section-2", "https://site0.example/p/0"),
    ("https://site1.example:443/p/1", "https://site1.example/p/1"),
    ("http://site2.example:80/p/2", "http://site2.example/p/2"),
    ("https://h.example/p?utm_source=feed&utm_medium=rss",
     "https://h.example/p"),
    # utm first but other params survive: '&' promoted back to '?'
    ("https://h.example/p?utm_source=f&a=2", "https://h.example/p?a=2"),
    # utm in the middle
    ("https://h.example/p?a=1&utm_campaign=x&b=2",
     "https://h.example/p?a=1&b=2"),
    ("https://h.example/p/4/", "https://h.example/p/4"),
    ("https://h.example/", "https://h.example"),
    # trailing slash before a surviving query
    ("https://h.example/p/?a=1", "https://h.example/p?a=1"),
    # NON-default port survives
    ("http://h.example:8080/p", "http://h.example:8080/p"),
    # :443 on http is not a default port
    ("http://h.example:443/p", "http://h.example:443/p"),
    # untouched urls pass through
    ("https://h.example/p?a=1", "https://h.example/p?a=1"),
    ("HTTPS://H.EXAMPLE/P", "https://h.example/P"),  # path case kept
    # scheme-less: COMPLETELY unchanged (guarded head stage)
    ("Example.com/Path", "Example.com/Path"),
    # '&' in the path is data, not a query separator
    ("https://h.example/p&x", "https://h.example/p&x"),
    ("https://h.example/a&b?c=1", "https://h.example/a&b?c=1"),
    # 'utm_' in the path is untouched (query-scoped strip)
    ("https://h.example/a&utm_b=1/z", "https://h.example/a&utm_b=1/z"),
    # generic stages still apply to scheme-less strings
    ("ex.com/p?utm_source=x#f", "ex.com/p"),
]


def test_known_pairs():
    got = canonicalize_urls(pa.array([r for r, _ in CASES])).to_pylist()
    assert got == [c for _, c in CASES]


def test_idempotent():
    once = canonicalize_urls(pa.array([r for r, _ in CASES]))
    twice = canonicalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()


def test_sql_parity():
    """The DuckDB expression from canonicalize_sql must match the
    Arrow kernel byte-for-byte on every case — the oracle contract."""
    con = duckdb.connect()
    con.execute("CREATE TABLE u(x VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(r,) for r, _ in CASES])
    sql = [row[0] for row in
           con.execute(f"SELECT {canonicalize_sql('x')} FROM u").fetchall()]
    assert sql == [c for _, c in CASES]


def test_rules_are_sql_safe():
    # canonicalize_sql passes patterns into single-quoted literals
    for pat, rep, _ in CANON_RULES:
        assert "'" not in pat and "'" not in rep


from hypothesis import given, settings
from hypothesis import strategies as st

_HOST = st.builds(
    lambda a, b: f"{a}.{b}",
    st.text("abcDEF01-", min_size=1, max_size=8),
    st.sampled_from(["example", "test", "EXAMPLE"]),
)
_URL = st.builds(
    lambda scheme, host, port, segs, q, frag: (
        (f"{scheme}://{host}{port}" if scheme else host)
        + "".join(f"/{s}" for s in segs)
        + q + frag
    ),
    st.sampled_from(["http", "https", "HTTP", "HTTPS", ""]),  # ""=schemeless
    _HOST,
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(st.text("abXY09._~&", min_size=0, max_size=8), max_size=4),
    st.sampled_from(["", "?", "?a=1", "?utm_source=x", "?utm_x=1&b=2",
                     "?a=1&utm_campaign=c&b=2", "?utm_a=1&utm_b=2"]),
    st.sampled_from(["", "#", "#frag", "#a/b?c"]),
)


@settings(max_examples=500, deadline=None)
@given(st.lists(_URL, min_size=1, max_size=8))
def test_sql_parity_fuzz(urls):
    """Dual-executor contract under fuzz: the DuckDB fold and the
    Arrow fold agree byte-for-byte on generated URLs (host case,
    default/non-default ports, empty segments, utm mixes, bare '?'
    and '#'), and the Arrow result is idempotent."""
    got = canonicalize_urls(pa.array(urls, pa.string()))
    con = duckdb.connect()
    con.execute("CREATE TABLE u(i INT, x VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)",
                    list(enumerate(urls)))
    sql = [r[0] for r in con.execute(
        f"SELECT {canonicalize_sql('x')} FROM u ORDER BY i").fetchall()]
    assert got.to_pylist() == sql
    assert canonicalize_urls(got).to_pylist() == got.to_pylist()
