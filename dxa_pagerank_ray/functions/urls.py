"""Vectorized URL canonicalization.

The standard web-corpus pre-dedup step: collapse the cosmetic URL
variants a crawler accumulates (fragments, default ports, host case,
tracking parameters, trailing slashes) onto one canonical form BEFORE
any url-keyed dedup/join, so the same page fetched under five spellings
counts once.  Complements the per-row ``functions.html.normalize_url``
(which resolves relative hrefs during link extraction): this module is
the batch-level kernel for URL columns already in absolute form.

Design contract — ONE staged rule set, TWO executors:

* ``canonicalize_urls`` executes the stages over a pyarrow string
  array with ``pc.replace_substring_regex`` / ``pc.if_else`` (RE2 C
  kernels, one pass per rule, zero Python per row);
* ``canonicalize_sql`` emits the equivalent DuckDB expression from
  the SAME pattern strings.

Both engines execute RE2, so pattern semantics (leftmost match, greedy
quantifiers, ``\\1``/``\\2`` backrefs, unset optional group = empty)
are identical by construction and a DuckDB oracle can hash-match the
distributed run exactly.  Patterns deliberately avoid lookarounds
(RE2 has none) and anchor where only one match is intended, so the
"replace all" (Arrow) vs "replace first" (DuckDB default) difference
is only exercised by the one rule that needs it (``utm`` strip, which
passes the ``g`` flag).

Stages (order matters):

1. **head lowering** — lowercase scheme+authority; a string with no
   ``://`` head passes through COMPLETELY unchanged (guarded by a
   match test on both sides — without the guard the Arrow join would
   double the string while SQL's ``regexp_extract`` returned '');
2. **fragment strip** — pure client-side state;
3. **query-scoped cleanup** — the string splits at the FIRST ``?``
   into (pre, query); the ``utm_*`` strip, the ``&``→``?`` promotion
   and the dangling-``?`` drop apply to the query part ONLY, so a
   literal ``&`` in a path or userinfo can never be rewritten (query
   rules on the whole string were measured to corrupt
   ``/a&b?c=1``-shaped URLs);
4. **tail rules** on the rejoined string — scheme-default ports,
   ONE trailing slash.

Input assumption: absolute ASCII http(s) URLs (the link-extraction
output contract); anything else passes the head stage unchanged and
only the generic stages (fragment/query/slash) apply.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme + authority prefix of an absolute URL ("https://Host:443");
# everything before the first /, ? or # after the ://
_HEAD = r"^([^/?#]*://[^/?#]*)"

# stage-2 fragment strip ((?s): a stray newline must not stop the
# strip — '.' is newline-blind in RE2 by default)
_FRAGMENT: tuple[str, str, bool] = (r"(?s)#.*$", "", False)

# stage-3 split anchors: pre = everything before the first '?',
# query = '?...' or '' (negated classes cross newlines by themselves)
_QSPLIT = r"(?s)\?.*$"
_QHEAD = r"(?s)^[^?]*"

# stage-3 rules, applied to the QUERY PART ONLY, in order:
# strip utm_* params wherever they sit (multi-match -> global flag);
# if the strip removed the leading "?x=..." the first survivor's
# separator is '&' — promote it back to '?'; drop a fully-emptied '?'
QUERY_RULES: list[tuple[str, str, bool]] = [
    (r"[?&]utm_[a-z_]+=[^&]*", "", True),
    (r"^&", "?", False),
    (r"^\?$", "", False),
]

# stage-4 rules on the rejoined string: scheme-default ports (\2
# unset -> empty in RE2; lowercase schemes only, so AFTER stage 1),
# then ONE trailing slash ("https://h/p/" == "https://h/p", bare root
# "https://h/" == "https://h")
TAIL_RULES: list[tuple[str, str, bool]] = [
    (r"(?s)^(http://[^/:?#]+):80([/?].*)?$", r"\1\2", False),
    (r"(?s)^(https://[^/:?#]+):443([/?].*)?$", r"\1\2", False),
    (r"^([^?#]*[^/?#])/(\?[^#]*)?$", r"\1\2", False),
]

#: every (pattern, replacement, global) tuple both executors share —
#: kept for the sql-safety test and for callers that only need the
#: flat inventory.
CANON_RULES: list[tuple[str, str, bool]] = (
    [_FRAGMENT] + QUERY_RULES + TAIL_RULES
)


def _rep(arr, rule: tuple[str, str, bool]):
    pat, rep, _ = rule
    return pc.replace_substring_regex(arr, pattern=pat, replacement=rep)


def canonicalize_urls(urls) -> pa.ChunkedArray:
    """Canonical form of each URL in a pyarrow string array/chunked
    array (see module docstring for the staged semantics).  Row-local,
    one RE2 C pass per rule.  Idempotent (pytest-pinned):
    ``canonicalize_urls(canonicalize_urls(x)) == canonicalize_urls(x)``.
    """
    # 1. head lowering, guarded: no :// head -> unchanged
    matched = pc.match_substring_regex(urls, pattern=_HEAD)
    head = pc.replace_substring_regex(
        urls, pattern=r"(?s)" + _HEAD + r".*$", replacement=r"\1")
    rest = pc.replace_substring_regex(urls, pattern=_HEAD,
                                      replacement="")
    out = pc.if_else(matched,
                     pc.binary_join_element_wise(
                         pc.utf8_lower(head), rest, ""),
                     urls)
    # 2. fragment
    out = _rep(out, _FRAGMENT)
    # 3. query-scoped cleanup
    pre = pc.replace_substring_regex(out, pattern=_QSPLIT, replacement="")
    q = pc.replace_substring_regex(out, pattern=_QHEAD, replacement="")
    for rule in QUERY_RULES:
        q = _rep(q, rule)
    out = pc.binary_join_element_wise(pre, q, "")
    # 4. ports + trailing slash
    for rule in TAIL_RULES:
        out = _rep(out, rule)
    return out


def canonicalize_sql(expr: str) -> str:
    """DuckDB expression computing exactly ``canonicalize_urls`` for
    the SQL string ``expr`` — the oracle half of the shared-rule
    contract.  DuckDB's regexp functions are RE2 too; the only
    dialect delta is the explicit ``g`` flag where Arrow replaces
    all.  DuckDB single-quoted literals are NOT backslash-escaped, so
    patterns pass through verbatim (only quotes would need doubling,
    and no rule contains one — asserted)."""
    def _fold(e: str, rule: tuple[str, str, bool]) -> str:
        pat, rep, g = rule
        assert "'" not in pat and "'" not in rep
        flag = ", 'g'" if g else ""
        return f"regexp_replace({e}, '{pat}', '{rep}'{flag})"

    assert "'" not in _HEAD and "'" not in _QSPLIT and "'" not in _QHEAD
    out = (f"(CASE WHEN regexp_matches({expr}, '{_HEAD}') THEN "
           f"lower(regexp_extract({expr}, '{_HEAD}', 1)) || "
           f"regexp_replace({expr}, '{_HEAD}', '') "
           f"ELSE {expr} END)")
    out = _fold(out, _FRAGMENT)
    pre = f"regexp_replace({out}, '{_QSPLIT}', '')"
    q = f"regexp_replace({out}, '{_QHEAD}', '')"
    for rule in QUERY_RULES:
        q = _fold(q, rule)
    out = f"({pre} || {q})"
    for rule in TAIL_RULES:
        out = _fold(out, rule)
    return out
