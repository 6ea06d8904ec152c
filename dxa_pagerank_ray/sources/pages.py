"""Deterministic Common-Crawl-style pages fixture (FIXTURES.md F1).

Schema (BASELINE.json input_hint):
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``

The page table is synthesized fully deterministically from ``(n_pages,
n_domains, seed)``: per-page edge targets come from a counter-keyed RNG
(``np.random.default_rng([seed, page_id])``), the html renders those
targets as anchors (mixed absolute/relative, plus fragment/mailto/dup
noise), and the ``text`` column is the pinned oracle extraction of the
html — so distributed re-extraction can be byte-compared against it.

Deliberate graph noise baked in (FIXTURES.md F2): duplicate hrefs on a
page (exact-dedup test), hrefs to urls outside the table (dangling
*targets*), pages with zero anchors (dangling *vertices* — the analogue
of the reference input format's ``0`` sentinel rows,
``/root/reference/README.md:50-59``), and a hub page receiving ~30% of
all pages' extra links (skew test).

Generation scales out: ``pages_dataset`` renders pages inside
``map_batches`` over ``ray.data.range`` — per-page determinism means the
distributed rows equal the driver-side ``pages_table`` rows exactly.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

from ..functions.html import extract_text

_LANGS = ["en", "de", "fr", "es", "zz"]
_WORDS = (
    "graph rank link crawl page node edge walk mass damp iterate "
    "partition shuffle block batch arrow stream vector spill actor"
).split()
_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)


def url_of(i: int, n_domains: int) -> str:
    return f"https://site{i % n_domains}.example/p/{i}"


def default_domains(n_pages: int) -> int:
    return max(1, min(8 if n_pages <= 64 else 50, n_pages))


def _page_targets(i: int, n_pages: int, n_domains: int, seed: int,
                  mean_out: float) -> list[str]:
    """Normalized target urls of page ``i`` in document order (the
    ground-truth link list; duplicates preserved)."""
    rng = np.random.default_rng([seed, i])
    targets: list[str] = []
    if i % 17 != 0:  # every 17th page is dangling (zero anchors)
        k = int(min(rng.poisson(mean_out), max(n_pages - 1, 1)))
        for t in rng.integers(0, n_pages, size=k):
            t = int(t)
            if t == i:  # no self-links in the fixture graph
                t = (i + 1) % n_pages
                if t == i:
                    continue
            targets.append(url_of(t, n_domains))
        if rng.random() < 0.3 and i != 0:  # hub: page 0 draws extra in-links
            targets.append(url_of(0, n_domains))
        if targets and rng.random() < 0.25:  # duplicate href noise
            targets.append(targets[0])
        if rng.random() < 0.2:  # link to a url outside the table
            j = int(rng.integers(0, 1000))
            targets.append(f"https://ext{j % 7}.example/e/{j}")
    return targets


def expected_links(n_pages: int, n_domains: int | None = None, seed: int = 42,
                   mean_out: float = 4.0):
    """Ground-truth ``(src_url, dst_url)`` pairs, duplicates preserved."""
    if n_domains is None:
        n_domains = default_domains(n_pages)
    src, dst = [], []
    for i in range(n_pages):
        u = url_of(i, n_domains)
        for t in _page_targets(i, n_pages, n_domains, seed, mean_out):
            src.append(u)
            dst.append(t)
    return src, dst


def _render_page(i: int, n_pages: int, n_domains: int, seed: int, mean_out: float):
    u = url_of(i, n_domains)
    targets = _page_targets(i, n_pages, n_domains, seed, mean_out)
    rng = np.random.default_rng([seed, i, 7])
    words = [_WORDS[int(w)] for w in rng.integers(0, len(_WORDS), size=40)]
    paras = [
        " ".join(words[j * 10 : (j + 1) * 10]) + f" ({i}.{j})" for j in range(4)
    ]
    body: list[str] = [f"<h1>Page {i}</h1>"]
    for j, p in enumerate(paras):
        body.append(f"<p>{p}</p>")
        # Interleave anchors between paragraphs, round-robin.
        for a, t in enumerate(targets):
            if a % len(paras) == j:
                same_domain = t.startswith(f"https://site{i % n_domains}.example/")
                href = t[t.index("/p/"):] if same_domain and "/p/" in t else t
                body.append(f'<a href="{href}">link {a}</a>')
    # Noise the extractor must ignore: fragments, mailto, script, style.
    body.append('<a href="#top">top</a>')
    if i % 3 == 0:
        body.append('<a href="mailto:x@example.com">mail</a>')
    html = (
        f"<html><head><title>Title {i}</title>"
        f"<style>p {{ color: #000; }}</style>"
        f"<script>var x = {i};</script></head>"
        f"<body>{''.join(body)}"
        f"<script>console.log({i})</script></body></html>"
    ).encode("utf-8")
    return {
        "url": u,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
        "html": html,
        "text": extract_text(html),
        "lang": _LANGS[(i % n_domains) % len(_LANGS)],
    }


_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_SCHEMA)


def pages_table(n_pages: int, n_domains: int | None = None, seed: int = 42,
                mean_out: float = 4.0) -> pa.Table:
    """Driver-side (single-process) fixture build — tiny/small scales."""
    if n_domains is None:
        n_domains = default_domains(n_pages)
    return _rows_to_table(
        [_render_page(i, n_pages, n_domains, seed, mean_out) for i in range(n_pages)]
    )


def pages_dataset(n_pages: int, n_domains: int | None = None, seed: int = 42,
                  mean_out: float = 4.0, override_num_blocks: int | None = None):
    """Distributed fixture build: ``range(n) -> map_batches(render)``.

    Row-identical to ``pages_table`` (per-page counter-keyed RNG), so it
    is safe for bench-scale generation.
    """
    import ray.data as rd

    if n_domains is None:
        n_domains = default_domains(n_pages)

    def render(batch: dict) -> pa.Table:
        return _rows_to_table(
            [_render_page(int(i), n_pages, n_domains, seed, mean_out)
             for i in batch["id"]]
        )

    ds = rd.range(n_pages, override_num_blocks=override_num_blocks)
    return ds.map_batches(render, batch_format="numpy")


def write_pages_parquet(out_dir: str, n_pages: int, seed: int = 42,
                        mean_out: float = 4.0,
                        override_num_blocks: int | None = None) -> str:
    """Materialize the fixture as a Parquet directory (bench input)."""
    pages_dataset(n_pages, seed=seed, mean_out=mean_out,
                  override_num_blocks=override_num_blocks).write_parquet(out_dir)
    return out_dir
