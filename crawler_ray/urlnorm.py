"""Vectorized URL normalization, host extraction and scope predicates.

Re-expresses the reference's URL handling (SURVEY.md §2.8: the `url`,
`percent-encoding` and `case_insensitive_string` crates behind spider —
Cargo.lock:2739,1501,289 — invoked from /root/reference/src/scanner/scan.rs:76)
as pure ``pyarrow.compute`` kernels over Arrow string arrays, with a
``urllib.parse`` slow path only for relative URLs.

Semantics notes vs reference:
  * spider compares visited URLs case-insensitively on the whole string; we
    lowercase scheme+host (correct per RFC 3986) and compare the normalized URL
    exactly. For corpora whose doc_ids are already lowercase the two agree.
  * `tld` scope uses "last two labels" as the registrable domain (no public
    suffix list in this sandbox); spider uses a PSL. Documented simplification.

All functions take/return ``pa.Array`` / ``pa.ChunkedArray`` and never loop
over Python rows except in the relative-URL fallback.
"""

from __future__ import annotations

from urllib.parse import urljoin

import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<auth>[^/#?]*)(?P<rest>[^#]*)"


def _combine(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def normalize(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Normalize absolute URLs: trim, drop fragment, lowercase scheme+host,
    strip default ports (:80 http / :443 https), ensure a path ('' → '/').

    Rows that are not absolute URLs (no ``scheme://``) come back null —
    resolve them against a base first with :func:`resolve`.
    """
    urls = _combine(urls)
    trimmed = pc.utf8_trim_whitespace(urls)
    ex = pc.extract_regex(trimmed, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    auth = pc.utf8_lower(pc.struct_field(ex, "auth"))
    # drop userinfo — matches oracle.norm(), which rebuilds the netloc from
    # hostname[:port]; without this the engine and ground truth diverge on
    # user@host URLs
    auth = pc.replace_substring_regex(auth, r"^[^@]*@", "")
    rest = pc.struct_field(ex, "rest")
    # strip default port for the matching scheme only
    auth = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(auth, r":443$", ""),
        pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(auth, r":80$", ""),
            auth,
        ),
    )
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    return pc.binary_join_element_wise(scheme, pa.scalar("://"), auth, rest, "")


def normalize_and_host(urls: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Single-pass variant: one ``extract_regex`` yields both the normalized
    URL and its host (the hot path in link extraction runs over every
    discovered link — two separate passes measurably double the regex cost).
    """
    urls = _combine(urls)
    trimmed = pc.utf8_trim_whitespace(urls)
    ex = pc.extract_regex(trimmed, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    auth = pc.utf8_lower(pc.struct_field(ex, "auth"))
    auth = pc.replace_substring_regex(auth, r"^[^@]*@", "")  # userinfo (see normalize)
    rest = pc.struct_field(ex, "rest")
    auth = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(auth, r":443$", ""),
        pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(auth, r":80$", ""),
            auth,
        ),
    )
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    normalized = pc.binary_join_element_wise(scheme, pa.scalar("://"), auth, rest, "")
    host = pc.replace_substring_regex(auth, r":\d+$", "")
    return normalized, host


def resolve(urls: pa.Array | pa.ChunkedArray, bases: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Absolute-ize: rows already absolute pass through; relative rows are
    resolved against their per-row base with ``urllib.parse.urljoin`` (slow
    path, only touches the relative subset)."""
    urls = _combine(urls)
    is_abs = pc.match_substring_regex(urls, r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    if pc.all(is_abs).as_py():
        return urls
    out = urls.to_pylist()
    b = _combine(bases).to_pylist()
    for i, flag in enumerate(is_abs.to_pylist()):
        if not flag and out[i] is not None:
            out[i] = urljoin(b[i] or "", out[i])
    return pa.array(out, pa.string())


def host_of(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Lowercased authority minus userinfo and port. Null for non-absolute."""
    urls = _combine(urls)
    ex = pc.extract_regex(urls, _URL_RE)
    auth = pc.utf8_lower(pc.struct_field(ex, "auth"))
    auth = pc.replace_substring_regex(auth, r"^[^@]*@", "")
    return pc.replace_substring_regex(auth, r":\d+$", "")


def path_of(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Path+query of an absolute URL ('' → '/')."""
    urls = _combine(urls)
    ex = pc.extract_regex(urls, _URL_RE)
    rest = pc.struct_field(ex, "rest")
    return pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)


# Embedded subset of the ICANN public suffix list: the common two-label
# suffixes under which registrations happen one level deeper (PSL,
# publicsuffix.org — public knowledge; spider resolves these via the full
# list, SURVEY §2.8). Wildcard/exception PSL rules are out of scope and
# documented as such; unknown hosts fall back to "last two labels".
PSL_TWO_LABEL = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
        "plc.uk", "sch.uk", "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "id.au", "asn.au", "com.br", "net.br", "org.br", "gov.br", "co.jp",
        "ne.jp", "or.jp", "ac.jp", "go.jp", "co.nz", "net.nz", "org.nz",
        "govt.nz", "co.za", "org.za", "net.za", "gov.za", "com.cn", "net.cn",
        "org.cn", "gov.cn", "edu.cn", "com.mx", "com.ar", "com.tr", "com.tw",
        "com.hk", "com.sg", "com.my", "co.in", "net.in", "org.in", "gov.in",
        "ac.in", "co.kr", "or.kr", "go.kr", "ne.kr", "co.id", "or.id",
        "co.th", "ac.th", "go.th", "com.vn", "com.ph", "com.pk", "co.il",
        "org.il", "ac.il", "gov.il", "com.ua", "in.ua", "com.pl", "net.pl",
        "org.pl", "com.eg", "com.sa",
    }
)
_PSL_ARR = pa.array(sorted(PSL_TWO_LABEL))


def registrable_stem(hosts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """First label of the registrable domain: 'sub.site-0003.test' →
    'site-0003', 'shop.example.co.uk' → 'example' (PSL-aware for the embedded
    two-label suffix subset; plain last-two-labels otherwise)."""
    hosts = _combine(hosts)
    ex = pc.extract_regex(hosts, r"(?P<stem>[^.]+)\.[^.]+$")
    stem2 = pc.struct_field(ex, "stem")
    ex3 = pc.extract_regex(hosts, r"(?P<l3>[^.]+)\.(?P<l2>[^.]+)\.(?P<l1>[^.]+)$")
    l3 = pc.struct_field(ex3, "l3")
    suffix2 = pc.binary_join_element_wise(
        pc.struct_field(ex3, "l2"), pc.struct_field(ex3, "l1"), "."
    )
    on_psl = pc.fill_null(
        pc.and_(pc.is_valid(l3), pc.is_in(suffix2, value_set=_PSL_ARR)), False
    )
    stem = pc.if_else(on_psl, l3, stem2)
    # single-label host: stem is the host itself
    return pc.if_else(pc.is_valid(stem), stem, hosts)


def in_scope(
    dst_hosts: pa.Array | pa.ChunkedArray,
    seed_host: str,
    *,
    subdomains: bool = False,
    tld: bool = False,
) -> pa.Array:
    """Scope predicate M4 (reference: spider config set at
    src/scanner/scan.rs:27-28 from proto/crawler.proto:22-23).

    Base: exact host match. ``subdomains``: also any ``*.seed_host``.
    ``tld``: also any host whose registrable-domain stem matches the seed's.
    """
    dst_hosts = _combine(dst_hosts)
    ok = pc.equal(dst_hosts, seed_host.lower())
    if subdomains:
        ok = pc.or_(ok, pc.ends_with(dst_hosts, "." + seed_host.lower()))
    if tld:
        seed_stem = registrable_stem(pa.array([seed_host.lower()]))[0].as_py()
        ok = pc.or_(ok, pc.equal(registrable_stem(dst_hosts), seed_stem))
    return ok


def blacklist_mask(
    urls: pa.Array | pa.ChunkedArray, patterns: list[str]
) -> pa.Array:
    """True where the URL matches any blacklist regex (M5; reference feature
    flag Cargo.toml:43 → spider/regex). Compile once per call site via
    functools or actor state when hot."""
    urls = _combine(urls)
    if not patterns:
        return pc.equal(pa.nulls(len(urls), pa.bool_()).fill_null(False), True)
    alt = "|".join(f"(?:{p})" for p in patterns)
    return pc.match_substring_regex(urls, alt)
