"""Vectorized URL canonicalization.

The standard web-corpus pre-dedup step: collapse the cosmetic URL
variants a crawler accumulates (fragments, default ports, host case,
tracking parameters, trailing slashes) onto one canonical form BEFORE
any url-keyed dedup/join, so the same page fetched under five spellings
counts once.  Complements the per-row ``functions.html.normalize_url``
(which resolves relative hrefs during link extraction): this module is
the batch-level kernel for URL columns already in absolute form.

Design contract — ONE rule list, TWO executors:

* ``canonicalize_urls`` folds the rules over a pyarrow string array
  with ``pc.replace_substring_regex`` (RE2 C kernels, one pass per
  rule, zero Python per row);
* ``canonicalize_sql`` emits the equivalent DuckDB expression by
  folding ``regexp_replace`` over the SAME pattern strings.

Both engines execute RE2, so pattern semantics (leftmost match, greedy
quantifiers, ``\\1``/``\\2`` backrefs, unset optional group = empty)
are identical by construction and a DuckDB oracle can hash-match the
distributed run exactly.  Patterns deliberately avoid lookarounds
(RE2 has none) and anchor where only one match is intended, so the
"replace all" (Arrow) vs "replace first" (DuckDB default) difference
is only exercised by the one rule that needs it (``utm`` strip, which
passes the ``g`` flag).

Input assumption: absolute ASCII http(s) URLs (the link-extraction
output contract).  A scheme-less string passes through the scheme-head
split unchanged except for lowercasing, which is the least-surprise
fallback.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme + authority prefix of an absolute URL ("https://Host:443");
# everything before the first /, ? or # after the ://
_HEAD = r"^([^/?#]*://[^/?#]*)"

# (pattern, replacement, needs_global) applied IN ORDER after the
# head-lowercasing step.  Order matters: fragments go first (later
# anchors assume no '#'), query cleanup before the trailing-slash rule
# (".../p/0/?utm_x=1" -> ".../p/0/" -> ".../p/0"), default ports after
# lowercasing (the pattern matches lowercase schemes only).
CANON_RULES: list[tuple[str, str, bool]] = [
    # 1. strip the fragment — pure client-side state
    (r"#.*$", "", False),
    # 2. strip tracking parameters (utm_*) wherever they sit in the
    #    query; multi-match, hence the global flag
    (r"[?&]utm_[a-z_]+=[^&#]*", "", True),
    # 3. if the utm strip removed the leading "?x=..." but later
    #    params survived, the first surviving separator is '&' —
    #    promote it back to '?' (anchored: single possible match)
    (r"^([^?&]*)&", r"\1?", False),
    # 4. drop a dangling '?' left by a fully-stripped query
    (r"\?$", "", False),
    # 5. strip scheme-default ports (\2 unset -> empty in RE2)
    (r"^(http://[^/:?#]+):80([/?].*)?$", r"\1\2", False),
    (r"^(https://[^/:?#]+):443([/?].*)?$", r"\1\2", False),
    # 6. strip ONE trailing slash ("https://h/p/" == "https://h/p",
    #    and the bare root "https://h/" == "https://h")
    (r"^([^?#]*[^/?#])/(\?[^#]*)?$", r"\1\2", False),
]


def canonicalize_urls(urls) -> pa.ChunkedArray:
    """Canonical form of each URL in a pyarrow string array/chunked
    array: lowercase scheme+host, then the ``CANON_RULES`` chain.
    Row-local, one RE2 C pass per rule.  Idempotent (pytest-pinned):
    ``canonicalize_urls(canonicalize_urls(x)) == canonicalize_urls(x)``.
    """
    head = pc.replace_substring_regex(urls, pattern=_HEAD + r".*$",
                                      replacement=r"\1")
    rest = pc.replace_substring_regex(urls, pattern=_HEAD,
                                      replacement="")
    out = pc.binary_join_element_wise(pc.utf8_lower(head), rest, "")
    for pat, rep, _ in CANON_RULES:
        out = pc.replace_substring_regex(out, pattern=pat,
                                         replacement=rep)
    return out


def canonicalize_sql(expr: str) -> str:
    """DuckDB expression computing exactly ``canonicalize_urls`` for
    the SQL string ``expr`` — the oracle half of the shared-rule
    contract.  DuckDB's regexp functions are RE2 too; the only
    dialect delta is the explicit ``g`` flag where Arrow replaces
    all.  DuckDB single-quoted literals are NOT backslash-escaped, so
    patterns pass through verbatim (only quotes would need doubling,
    and no rule contains one — asserted)."""
    out = (f"lower(regexp_extract({expr}, '{_HEAD}', 1)) || "
           f"regexp_replace({expr}, '{_HEAD}', '')")
    for pat, rep, g in CANON_RULES:
        assert "'" not in pat and "'" not in rep
        flag = ", 'g'" if g else ""
        out = f"regexp_replace({out}, '{pat}', '{rep}'{flag})"
    return out
