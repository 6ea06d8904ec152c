"""Minimal WARC 1.0 source/sink (ISO 28500 — the container format
Common Crawl actually ships).

- ``read_warc_pages(paths)``: Ray Data pipeline — ``read_binary_files``
  assigns ONE WARC file per task (the natural grain: Common Crawl
  splits the corpus into ~1 GB gzip members), a stateless
  ``map_batches`` parses the Content-Length-framed records and yields
  ``(url, warc_ts, html)`` rows, schema-compatible with the Parquet
  pages source (``text``/``lang`` derive downstream from ``html``).
  Only ``WARC-Type: response`` records emit rows; request/metadata/
  warcinfo records are skipped, mirroring a crawl-extraction job.
- ``write_warc(path, table)``: pages table -> one ``.warc``/
  ``.warc.gz`` of response records (fixture generator AND the sink
  side of the format; ``GzipFile`` reads multi-member gzip, so files
  produced by record-level gzip writers parse too).

No reference counterpart (dxa-pageRank reads only its text edge-list
format, `ReadLumpInEdgeListTask.java`); added as the "another source
format" item of the graft brief.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io

import numpy as np
import pyarrow as pa

_WARC_DATE = "%Y-%m-%dT%H:%M:%SZ"
# WARC 1.1 permits fractional seconds; the pages schema is
# timestamp[us], so emit microseconds whenever they are nonzero and
# accept them on read — a roundtrip is then lossless at any warc_ts
_WARC_DATE_FRAC = "%Y-%m-%dT%H:%M:%S.%fZ"


def _parse_warc(buf: bytes) -> list[tuple[str, str, bytes]]:
    """(target_uri, warc_date, http_payload) per response record.
    Content-Length framing per the spec; tolerant of any number of
    CRLF separators between records."""
    out = []
    i, n = 0, len(buf)
    while i < n:
        while buf[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        he = buf.find(b"\r\n\r\n", i)
        if he < 0:
            break
        lines = buf[i:he].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {i}: {lines[0]!r}")
        h = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            h[k.strip().lower()] = v.strip()
        clen = int(h.get("content-length", "0"))
        body = buf[he + 4 : he + 4 + clen]
        i = he + 4 + clen
        if h.get("warc-type") != "response":
            continue
        uri = h.get("warc-target-uri", "")
        date = h.get("warc-date", "")
        pe = body.find(b"\r\n\r\n")  # strip the HTTP response headers
        out.append((uri, date, body[pe + 4:] if pe >= 0 else body))
    return out


def _gunzip_all(b: bytes) -> bytes:
    """Decompress ALL gzip members (Common Crawl gzips per record;
    ``gzip.decompress`` would stop at the first member)."""
    return gzip.GzipFile(fileobj=io.BytesIO(b)).read()


def parse_warc_batch(batch: pa.Table) -> pa.Table:
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    for raw in batch["bytes"]:
        b = raw.as_py()
        if b[:2] == b"\x1f\x8b":
            b = _gunzip_all(b)
        for uri, date, payload in _parse_warc(b):
            urls.append(uri)
            try:
                ts = _dt.datetime.strptime(date, _WARC_DATE)
            except ValueError:
                ts = _dt.datetime.strptime(date, _WARC_DATE_FRAC)
            tss.append(int(ts.replace(tzinfo=_dt.timezone.utc)
                           .timestamp() * 1_000_000))
            htmls.append(payload)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.array(tss, dtype=np.int64),
                            pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
    })


def read_warc_pages(paths):
    """WARC file(s)/dir -> Dataset(url, warc_ts, html)."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        parse_warc_batch, batch_format="pyarrow")


def write_warc(path: str, table: pa.Table) -> int:
    """Pages table (url, warc_ts, html[, ...]) -> one WARC file of
    response records; gzip iff ``path`` ends in ``.gz``.  Returns the
    record count."""
    opener = gzip.open if path.endswith(".gz") else open
    urls = table["url"].to_pylist()
    tss = table["warc_ts"].to_pylist()
    htmls = table["html"].to_pylist()
    with opener(path, "wb") as f:
        for url, ts, html in zip(urls, tss, htmls):
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + b"Content-Length: %d\r\n\r\n" % len(html) + html)
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: "
                f"{ts.strftime(_WARC_DATE_FRAC if ts.microsecond else _WARC_DATE)}\r\n"
                "Content-Type: application/http;msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            f.write(head + http + b"\r\n\r\n")
    return len(urls)
