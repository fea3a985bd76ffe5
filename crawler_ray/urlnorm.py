"""Vectorized URL normalization, host extraction and scope predicates.

Re-expresses the reference's URL handling (SURVEY.md §2.8: the `url`,
`percent-encoding` and `case_insensitive_string` crates behind spider —
Cargo.lock:2739,1501,289 — invoked from /root/reference/src/scanner/scan.rs:76)
as pure ``pyarrow.compute`` kernels over Arrow string arrays, with a
``urllib.parse`` slow path only for relative URLs.

Semantics notes vs reference:
  * spider compares visited URLs case-insensitively on the whole string; the
    rebuild matches that exactly — normalization here lowercases scheme+host
    (RFC 3986), and the seen set additionally folds the WHOLE normalized URL
    at every membership boundary (``state/seen.py fold_urls``), keeping the
    originally-discovered casing for output.
  * `tld` scope resolves the registrable domain against the embedded ICANN
    public-suffix list (``psl_suffix_len`` below — normal, wildcard and
    exception rules); unknown suffixes fall back to "last two labels".
    spider resolves the same list via its PSL crate.

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


# --------------------------------------------------------------------------- #
# Embedded subset of the ICANN public suffix list (publicsuffix.org — public
# data; spider resolves the full list via its PSL crate, SURVEY §2.8). The
# RULE ENGINE below is complete per the PSL algorithm — normal rules,
# wildcard rules ("*.ck") and exception rules ("!www.ck"), longest match
# wins — over this embedded high-traffic data subset; hosts whose suffix
# matches no rule fall back to the implicit default rule "*" (the last label
# is the public suffix). Extra rules (e.g. a full downloaded list) can be
# appended via ``load_psl_rules``.

_US_STATES = (
    "al ak az ar ca co ct de fl ga hi id il in ia ks ky la me md ma mi mn ms "
    "mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc sd tn tx ut vt va wa wv "
    "wi wy dc"
).split()

PSL_RULES = frozenset(
    {
        # wildcard rules (any single label under the base is a public suffix)
        "*.bd", "*.ck", "*.er", "*.fk", "*.kh", "*.mm", "*.np", "*.pg",
        "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
        "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
        # exception rules (carve-outs from the wildcards above)
        "!www.ck", "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
        "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
        "!city.yokohama.jp",
    }
    | {
        # normal two-label rules, grouped by ccTLD
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
        "plc.uk", "sch.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
        "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
        "adv.br", "eng.br", "ind.br", "inf.br", "jus.br", "med.br", "rec.br",
        "srv.br", "tur.br", "tv.br", "vet.br",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
        "gr.jp", "lg.jp",
        "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz", "gen.nz",
        "kiwi.nz", "maori.nz", "mil.nz", "school.nz",
        "co.za", "org.za", "net.za", "gov.za", "ac.za", "edu.za", "web.za",
        "mil.za", "nom.za", "school.za",
        "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
        "co.in", "net.in", "org.in", "gov.in", "ac.in", "edu.in", "res.in",
        "firm.in", "gen.in", "ind.in", "mil.in", "nic.in",
        "co.kr", "or.kr", "go.kr", "ne.kr", "re.kr", "pe.kr", "ac.kr",
        "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "mil.kr",
        "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "net.id",
        "mil.id", "biz.id", "my.id", "desa.id",
        "co.th", "ac.th", "go.th", "or.th", "in.th", "mi.th", "net.th",
        "co.il", "org.il", "ac.il", "gov.il", "muni.il", "net.il", "k12.il",
        "idf.il",
        "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
        "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "gov.ar", "int.ar",
        "mil.ar", "tur.ar",
        "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "biz.tr", "info.tr",
        "av.tr", "bbs.tr", "bel.tr", "dr.tr", "gen.tr", "k12.tr", "kep.tr",
        "mil.tr", "name.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
        "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "mil.tw", "idv.tw",
        "game.tw", "ebiz.tw", "club.tw",
        "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
        "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
        "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
        "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
        "i.ph",
        "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk", "biz.pk",
        "web.pk", "gob.pk", "gok.pk", "gop.pk", "gos.pk",
        "com.ua", "in.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "kiev.ua",
        "kharkov.ua", "lviv.ua", "odessa.ua", "dp.ua",
        "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "biz.pl",
        "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl",
        "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "eun.eg",
        "mil.eg", "name.eg",
        "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
        "sch.sa",
        "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae", "mil.ae",
        "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "i.ng", "sch.ng",
        "name.ng", "mobi.ng",
        "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
        "me.ke", "mobi.ke",
        "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz", "hotel.tz",
        "info.tz", "me.tz", "mil.tz", "mobi.tz", "tv.tz",
        "co.ug", "or.ug", "ne.ug", "go.ug", "ac.ug", "sc.ug",
        "com.zm", "org.zm", "gov.zm", "edu.zm", "ac.zm",
        "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
        "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "int.vn", "ac.vn",
        "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
        "com.lk", "org.lk", "edu.lk", "ngo.lk", "soc.lk", "web.lk", "ltd.lk",
        "assn.lk", "grp.lk", "hotel.lk", "gov.lk", "sch.lk", "net.lk",
        "int.lk",
        "co.ir", "net.ir", "org.ir", "gov.ir", "ac.ir", "sch.ir", "id.ir",
        "com.iq", "net.iq", "org.iq", "gov.iq", "edu.iq", "mil.iq",
        "com.jo", "net.jo", "org.jo", "gov.jo", "edu.jo", "sch.jo", "name.jo",
        "mil.jo",
        "com.lb", "net.lb", "org.lb", "gov.lb", "edu.lb",
        "com.kw", "net.kw", "org.kw", "gov.kw", "edu.kw", "ind.kw", "emb.kw",
        "com.qa", "net.qa", "org.qa", "gov.qa", "edu.qa", "sch.qa", "mil.qa",
        "name.qa",
        "com.om", "net.om", "org.om", "gov.om", "edu.om", "med.om", "pro.om",
        "co.om", "museum.om",
        "com.bh", "net.bh", "org.bh", "gov.bh", "edu.bh",
        "com.et", "gov.et", "org.et", "edu.et", "net.et", "biz.et", "name.et",
        "info.et",
        "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
        "co.ma", "net.ma", "gov.ma", "org.ma", "ac.ma", "press.ma",
        "com.tn", "net.tn", "org.tn", "gov.tn", "edunet.tn", "ens.tn",
        "fin.tn", "ind.tn", "info.tn", "intl.tn", "nat.tn", "rns.tn",
        "rnu.tn", "tourism.tn",
        "com.dz", "net.dz", "org.dz", "gov.dz", "edu.dz", "asso.dz", "pol.dz",
        "art.dz",
        "com.ly", "net.ly", "org.ly", "gov.ly", "edu.ly", "sch.ly", "med.ly",
        "plc.ly", "id.ly",
        "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy", "mil.uy",
        "com.py", "net.py", "org.py", "gov.py", "edu.py", "mil.py", "coop.py",
        "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe", "nom.pe",
        "com.ec", "net.ec", "org.ec", "gob.ec", "gov.ec", "edu.ec", "mil.ec",
        "fin.ec", "med.ec", "pro.ec", "info.ec",
        "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
        "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve", "web.ve",
        "co.ve", "info.ve",
        "com.bo", "net.bo", "org.bo", "gob.bo", "edu.bo", "mil.bo", "tv.bo",
        "web.bo",
        "gob.cl", "gov.cl", "co.cl", "mil.cl",
        "co.cr", "ac.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
        "com.gt", "net.gt", "org.gt", "gob.gt", "edu.gt", "mil.gt", "ind.gt",
        "com.do", "net.do", "org.do", "gob.do", "edu.do", "gov.do", "mil.do",
        "web.do", "art.do", "sld.do",
        "com.sv", "org.sv", "gob.sv", "edu.sv", "red.sv",
        "com.hn", "net.hn", "org.hn", "gob.hn", "edu.hn", "mil.hn",
        "com.ni", "net.ni", "org.ni", "gob.ni", "edu.ni", "mil.ni",
        "com.pa", "net.pa", "org.pa", "gob.pa", "ac.pa", "sld.pa", "edu.pa",
        "ing.pa", "abo.pa", "med.pa", "nom.pa",
        "com.cu", "net.cu", "org.cu", "gov.cu", "edu.cu", "inf.cu",
        "co.at", "or.at", "ac.at", "gv.at", "priv.at",
        "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
        "gov.it", "edu.it",
        "com.es", "nom.es", "org.es", "gob.es", "edu.es",
        "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
        "nome.pt",
        "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
        "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
        "arts.ro", "firm.ro", "store.ro", "www.ro",
        "co.hu", "info.hu", "org.hu", "priv.hu", "sport.hu", "tm.hu",
        "2000.hu", "agrar.hu", "bolt.hu", "city.hu", "film.hu",
        "com.se", "pp.se", "org.se",
        "co.gg", "net.gg", "org.gg", "co.je", "net.je", "org.je", "co.im",
        "net.im", "org.im", "ac.im", "com.im", "tt.im", "tv.im",
        "co.ao", "ed.ao", "gv.ao", "it.ao", "og.ao", "pb.ao",
        "co.mz", "ac.mz", "gov.mz", "edu.mz", "org.mz",
        "co.zw", "ac.zw", "gov.zw", "mil.zw", "org.zw",
        "co.bw", "org.bw",
        "co.ls", "org.ls", "ac.ls", "gov.ls",
        "com.na", "co.na", "org.na", "edu.na", "alt.na", "in.na", "info.na",
        "mobi.na", "net.na", "pro.na", "school.na", "tv.na", "ws.na",
        "com.bn", "net.bn", "org.bn", "edu.bn", "gov.bn",
        "com.kz", "net.kz", "org.kz", "gov.kz", "edu.kz", "mil.kz",
        "com.uz", "co.uz", "net.uz", "org.uz",
        "com.ge", "net.ge", "org.ge", "gov.ge", "edu.ge", "mil.ge", "pvt.ge",
        "com.am", "net.am", "org.am", "co.am", "north.am", "south.am",
        "com.az", "net.az", "org.az", "gov.az", "edu.az", "int.az", "mil.az",
        "name.az", "pro.az", "biz.az", "info.az", "pp.az",
        "com.by", "of.by", "gov.by", "mil.by",
        "com.kg", "net.kg", "org.kg", "gov.kg", "mil.kg",
        "com.mt", "net.mt", "org.mt", "edu.mt", "gov.mt",
        "com.cy", "net.cy", "org.cy", "gov.cy", "ac.cy", "biz.cy", "ltd.cy",
        "name.cy", "press.cy", "pro.cy", "tm.cy",
        "com.lv", "net.lv", "org.lv", "edu.lv", "gov.lv", "mil.lv", "id.lv",
        "asn.lv", "conf.lv",
        "com.lt", "net.lt", "org.lt", "gov.lt", "edu.lt", "mil.lt",
        "com.ee", "org.ee", "edu.ee", "gov.ee", "riik.ee", "lib.ee", "med.ee",
        "pri.ee", "aip.ee", "fie.ee",
        "com.bg", "net.bg", "org.bg", "gov.bg", "edu.bg",
        "com.mk", "net.mk", "org.mk", "gov.mk", "edu.mk", "inf.mk", "name.mk",
        "com.al", "net.al", "org.al", "gov.al", "edu.al", "mil.al",
        "co.rs", "org.rs", "edu.rs", "ac.rs", "gov.rs", "in.rs",
        "com.ba", "net.ba", "org.ba", "gov.ba", "edu.ba", "mil.ba",
        "co.me", "net.me", "org.me", "edu.me", "ac.me", "gov.me", "its.me",
        "priv.me",
        "com.hr", "from.hr", "iz.hr", "name.hr",
    }
    | {f"{st}.us" for st in _US_STATES}
    | {f"{kind}.{st}.us" for st in _US_STATES for kind in ("k12", "cc", "lib")}
)

# Back-compat alias: the two-label normal rules (oracle + older tests import
# this name; derived from PSL_RULES so the two can't drift)
PSL_TWO_LABEL = frozenset(r for r in PSL_RULES if r.count(".") == 1 and "*" not in r and "!" not in r)


def _parse_psl(rules):
    """PSL rule set → lookup tables for the matching algorithm. Normal rules
    are split by label count (public suffix = the rule itself); wildcard
    rules '*.base' mean one extra label under `base` is the suffix;
    exception rules '!name' carve `name` back out (its suffix is `name`
    minus its first label).

    Supported depth: suffixes up to THREE labels (normal rules ≤ 3 labels,
    wildcard bases ≤ 2, exceptions ≤ 3) — the matcher inspects the last
    four host labels. Deeper rules (the full PSL has a handful, e.g.
    4-label private-section entries) raise instead of silently matching
    nothing."""
    n2, n3, w1, w2, e2, e3 = set(), set(), set(), set(), set(), set()
    bad = []
    for r in rules:
        if r.startswith("!"):
            body = r[1:]
            if body.count(".") == 1:
                e2.add(body)
            elif body.count(".") == 2:
                e3.add(body)
            else:
                bad.append(r)
        elif r.startswith("*."):
            base = r[2:]
            if "." not in base:
                w1.add(base)
            elif base.count(".") == 1:
                w2.add(base)
            else:
                bad.append(r)
        elif r.count(".") == 1:
            n2.add(r)
        elif r.count(".") == 2:
            n3.add(r)
        elif r.count(".") >= 3:
            bad.append(r)
        # 1-label normal rules are implied by the default rule "*"
    if bad:
        raise ValueError(
            f"PSL rules deeper than the supported 3-label suffix depth: {sorted(bad)[:10]}"
            " — filter them out or extend the matcher"
        )
    return n2, n3, w1, w2, e2, e3


_N2, _N3, _W1, _W2, _E2, _E3 = _parse_psl(PSL_RULES)


def load_psl_rules(rules) -> None:
    """Extend the embedded subset with additional PSL rules (one rule per
    element; comment and empty lines are ignored; rules deeper than the
    supported 3-label suffix depth raise — pre-filter them).

    DRIVER-PROCESS ONLY: this mutates module globals, which Ray worker
    processes do NOT see (they import this module fresh). Distributed scope
    checks — the engine's in_scope stage — keep using the embedded rules;
    call this for driver-side normalization/analytics, or extend
    ``PSL_RULES`` at import time (e.g. a sitecustomize/module patch shipped
    in the job's working_dir) for cluster-wide effect."""
    global _N2, _N3, _W1, _W2, _E2, _E3
    extra = {
        r.strip()
        for r in rules
        if r.strip() and not r.strip().startswith("//")
    }
    for part, new in zip(
        (_N2, _N3, _W1, _W2, _E2, _E3), _parse_psl(extra), strict=True
    ):
        part.update(new)
    _refresh_psl_arrays()


def _refresh_psl_arrays():
    global _N2_ARR, _N3_ARR, _W1_ARR, _W2_ARR, _E2_ARR, _E3_ARR
    _N2_ARR = pa.array(sorted(_N2))
    _N3_ARR = pa.array(sorted(_N3))
    _W1_ARR = pa.array(sorted(_W1))
    _W2_ARR = pa.array(sorted(_W2))
    _E2_ARR = pa.array(sorted(_E2))
    _E3_ARR = pa.array(sorted(_E3))


_refresh_psl_arrays()


def psl_suffix_len(labels: list[str]) -> int:
    """Label count of the host's public suffix per the PSL algorithm
    (longest match wins; exception rules shorten the wildcard match by one).
    Scalar reference implementation — ``registrable_stem`` is the
    vectorized equivalent and the two must agree (property-tested)."""
    n = len(labels)
    s2 = ".".join(labels[-2:]) if n >= 2 else None
    s3 = ".".join(labels[-3:]) if n >= 3 else None
    if s3 in _E3:
        return 2
    if s2 in _E2:
        return 1
    if n >= 3 and (s3 in _N3 or s2 in _W2):
        return 3
    if n >= 2 and (s2 in _N2 or labels[-1] in _W1):
        return 2
    return 1


def stem_of_host(host: str) -> str:
    """First label of the registrable domain (scalar; shared by the crawl
    oracle so engine and ground truth cannot diverge on scope)."""
    labels = host.split(".")
    k = psl_suffix_len(labels)
    return labels[-k - 1] if len(labels) > k else labels[0]


def registrable_stem(hosts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """First label of the registrable domain, vectorized over Arrow strings:
    'sub.site-0003.test' → 'site-0003', 'shop.example.co.uk' → 'example',
    'foo.bar.ck' → 'foo' (wildcard *.ck), 'www.ck' → 'www' (exception
    !www.ck), 'x.k12.ca.us' → 'x' (three-label normal rule)."""
    hosts = _combine(hosts)
    ex2 = pc.extract_regex(hosts, r"(?P<m2>[^.]+)\.(?P<t1>[^.]+)$")
    m2, t1 = pc.struct_field(ex2, "m2"), pc.struct_field(ex2, "t1")
    ex3 = pc.extract_regex(hosts, r"(?P<m3>[^.]+)\.(?P<m2>[^.]+)\.(?P<t1>[^.]+)$")
    m3 = pc.struct_field(ex3, "m3")
    ex4 = pc.extract_regex(
        hosts, r"(?P<m4>[^.]+)\.(?P<m3>[^.]+)\.(?P<m2>[^.]+)\.(?P<t1>[^.]+)$"
    )
    m4 = pc.struct_field(ex4, "m4")
    s2 = pc.binary_join_element_wise(m2, t1, ".")
    s3 = pc.binary_join_element_wise(m3, pc.struct_field(ex3, "m2"), pc.struct_field(ex3, "t1"), ".")

    def _in(arr, vals):
        return pc.fill_null(pc.is_in(arr, value_set=vals), False) if len(vals) else pc.fill_null(pc.equal(arr, pa.scalar(None, pa.string())), False)

    exc3 = _in(s3, _E3_ARR)
    exc2 = _in(s2, _E2_ARR)
    len3 = pc.and_not(pc.or_(_in(s3, _N3_ARR), _in(s2, _W2_ARR)), pc.or_(exc3, exc2))
    len2_raw = pc.or_(_in(s2, _N2_ARR), _in(t1, _W1_ARR))
    len2 = pc.or_(exc3, pc.and_not(len2_raw, pc.or_(len3, exc2)))
    # first label — the fallback when the host IS a public suffix
    first = pc.struct_field(pc.extract_regex(hosts, r"^(?P<first>[^.]+)"), "first")
    stem = pc.if_else(
        len3,
        pc.coalesce(m4, first),
        pc.if_else(len2, pc.coalesce(m3, first), pc.coalesce(m2, hosts)),
    )
    return stem


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
