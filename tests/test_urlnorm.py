"""Unit tests for URL normalization + scope predicates (SURVEY.md §5.1)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray import urlnorm


def test_normalize_basic():
    urls = pa.array(
        [
            "HTTPS://Site-0001.Test:443/Page-01#frag",
            "http://example.test:80/a?q=1#x",
            "https://site-0002.test",
            "  https://site-0003.test/ ",
            "relative/path",
        ]
    )
    out = urlnorm.normalize(urls).to_pylist()
    assert out[0] == "https://site-0001.test/Page-01"
    assert out[1] == "http://example.test/a?q=1"
    assert out[2] == "https://site-0002.test/"
    assert out[3] == "https://site-0003.test/"
    assert out[4] is None  # relative → null, needs resolve()


def test_normalize_keeps_nondefault_port():
    out = urlnorm.normalize(pa.array(["https://h.test:8443/x", "http://h.test:443/x"]))
    assert out.to_pylist() == ["https://h.test:8443/x", "http://h.test:443/x"]


def test_resolve_relative():
    urls = pa.array(["page-2", "https://a.test/abs", "/root"])
    bases = pa.array(["https://a.test/dir/page-1"] * 3)
    out = urlnorm.resolve(urls, bases).to_pylist()
    assert out == ["https://a.test/dir/page-2", "https://a.test/abs", "https://a.test/root"]


def test_host_and_path():
    urls = pa.array(["https://User@Sub.Site.Test:8443/a/b?q#f", "https://site.test"])
    assert urlnorm.host_of(urls).to_pylist() == ["sub.site.test", "site.test"]
    assert urlnorm.path_of(urls).to_pylist() == ["/a/b?q", "/"]


SCOPE_TRUTH = [
    # dst_host, subdomains, tld, expected
    ("site-0001.test", False, False, True),
    ("sub.site-0001.test", False, False, False),
    ("sub.site-0001.test", True, False, True),
    ("deep.sub.site-0001.test", True, False, True),
    ("site-0002.test", True, False, False),
    ("site-0001.com", False, True, True),
    ("site-0001.org", False, True, True),
    ("site-0002.com", False, True, False),
    ("evil-site-0001.test", True, False, False),
]


@pytest.mark.parametrize("dst,subs,tld,want", SCOPE_TRUTH)
def test_scope_truth_table(dst, subs, tld, want):
    got = urlnorm.in_scope(
        pa.array([dst]), "site-0001.test", subdomains=subs, tld=tld
    ).to_pylist()
    assert got == [want]


def test_blacklist():
    urls = pa.array(["https://a.test/admin/x", "https://a.test/ok"])
    mask = urlnorm.blacklist_mask(urls, [r"/admin/"]).to_pylist()
    assert mask == [True, False]
    none = urlnorm.blacklist_mask(urls, []).to_pylist()
    assert none == [False, False]


@settings(max_examples=50, deadline=None)
@given(
    host=st.from_regex(r"[a-z][a-z0-9\-]{0,10}\.(test|com)", fullmatch=True),
    path=st.from_regex(r"/[a-zA-Z0-9/_\-]{0,20}", fullmatch=True),
)
def test_normalize_idempotent(host, path):
    url = f"https://{host}{path}"
    once = urlnorm.normalize(pa.array([url]))
    twice = urlnorm.normalize(once)
    assert once.to_pylist() == twice.to_pylist()
    assert once[0].as_py() is not None


def test_registrable_stem_psl_aware():
    """PSL subset: *.co.uk-style hosts register one level deeper (VERDICT r1
    missing #3); unknown suffixes keep the last-two-labels fallback."""
    import pyarrow as pa

    from crawler_ray import urlnorm
    from crawler_ray.oracle import stem

    hosts = [
        "shop.example.co.uk",
        "example.co.uk",
        "sub.site-0003.test",
        "single",
        "a.b.com.au",
        "x.y.z.gov.uk",
    ]
    got = urlnorm.registrable_stem(pa.array(hosts, pa.string())).to_pylist()
    assert got == ["example", "example", "site-0003", "single", "b", "z"]
    # vectorized path ≡ plain-python oracle
    assert got == [stem(h) for h in hosts]


def test_registrable_stem_wildcard_exception_rules():
    """Full PSL rule semantics (VERDICT r2 #9): wildcard rules (*.ck — one
    extra label is a public suffix), exception rules (!www.ck — carved back
    out), and three-label normal rules (k12.<state>.us)."""
    import pyarrow as pa

    from crawler_ray import urlnorm
    from crawler_ray.oracle import stem

    cases = {
        "foo.bar.ck": "foo",          # *.ck → bar.ck is a public suffix
        "www.ck": "www",              # !www.ck → registrable is www.ck
        "a.www.ck": "www",
        "city.kawasaki.jp": "city",   # !city.kawasaki.jp
        "a.foo.kawasaki.jp": "a",     # *.kawasaki.jp
        "school.k12.ca.us": "school",  # 3-label normal rule
        "a.mysite.bd": "a",           # *.bd
        "www.example.com": "example",  # default rule "*"
    }
    got = urlnorm.registrable_stem(pa.array(list(cases), pa.string())).to_pylist()
    assert got == list(cases.values())
    # vectorized path ≡ scalar shared with the crawl oracle
    assert got == [stem(h) for h in cases]


def test_psl_scalar_vector_agree_on_arbitrary_hosts():
    """Property: the scalar PSL reference and the Arrow-vectorized path agree
    on every host shape (1-5 labels, rule or no rule)."""
    import pyarrow as pa

    from crawler_ray import urlnorm

    labels = ["a", "www", "city", "k12", "co", "foo"]
    tails = ["ck", "uk", "jp", "us", "com", "bd", "test", "kawasaki.jp", "co.uk", "ca.us"]
    hosts = [f"{a}.{b}.{t}" for a in labels for b in labels for t in tails]
    hosts += [f"{b}.{t}" for b in labels for t in tails] + tails + ["solo"]
    vec = urlnorm.registrable_stem(pa.array(hosts, pa.string())).to_pylist()
    assert vec == [urlnorm.stem_of_host(h) for h in hosts]


def test_tld_scope_psl():
    import pyarrow as pa

    from crawler_ray import urlnorm

    dsts = pa.array(
        ["www.example.co.uk", "example.co.uk", "other.co.uk", "example.com"],
        pa.string(),
    )
    # tld=True admits any TLD sibling of the registrable name (spider's
    # "allow all tlds" flag) — so example.com is in scope for example.co.uk,
    # while other.co.uk (different registrable name) is not
    mask = urlnorm.in_scope(dsts, "shop.example.co.uk", tld=True).to_pylist()
    assert mask == [True, True, False, True]


# ------------------------- robots RFC 9309 semantics ----------------------- #

def test_robots_allow_longest_match():
    import numpy as np

    from crawler_ray.state.robots import RobotsPolicy, RobotsRules

    pol = RobotsPolicy(
        {"h.test": RobotsRules(disallow=("/private",), allow=("/private/ok",))}
    )
    hosts = np.array(["h.test"] * 4, dtype=object)
    paths = np.array(
        ["/private/x", "/private/ok/page", "/public", "/private"], dtype=object
    )
    assert pol.allowed(hosts, paths).tolist() == [False, True, True, False]
    # tie on length: allow wins (RFC 9309 least-restrictive)
    pol2 = RobotsPolicy({"h.test": RobotsRules(disallow=("/p",), allow=("/p",))})
    assert pol2.allowed(["h.test"], ["/page"]).tolist() == [True]


def test_robots_wildcard_truth_table():
    """RFC 9309 §2.2.3 '*' / '$' semantics: engine regexes vs the oracle's
    independent scanning matcher on the same truth table."""
    import numpy as np

    from crawler_ray.oracle import _rule_match
    from crawler_ray.state.robots import RobotsPolicy, RobotsRules

    cases = [
        # (rule, path, matches)
        ("/page-*1", "/page-0001", True),
        ("/page-*1", "/page-1000", True),   # prefix '/page-1' contains the 1
        ("/page-*1", "/page-0001/x", True), # rule matches a path prefix
        ("/page-*1", "/page-0000", False),
        ("/page-*1", "/other-0001", False),
        ("/page-0002$", "/page-0002", True),
        ("/page-0002$", "/page-00023", False),
        ("/page-0002$", "/page-0002/", False),
        ("/*?sort=", "/items?sort=asc", True),
        ("/*?sort=", "/items", False),
        ("/*.php$", "/index.php", True),
        ("/*.php$", "/index.php?x=1", False),
        ("/a*b*c$", "/aXbYc", True),
        ("/a*b*c$", "/aXbYcZ", False),
        ("/a*b*c", "/acb--c!", True),       # greedy-leftmost still finds it
        ("/$", "/", True),
        ("/$", "/x", False),
        ("/mid$dle", "/mid$dle-rest", True),  # mid-pattern $ is literal
        ("/mid$dle", "/middle", False),
        # regex-'$' trap: '$' matches before a trailing newline, RFC
        # end-of-path does not — the engine must use \Z (review r4 #6)
        ("/foo$", "/foo\n", False),
        ("/foo$", "/foo", True),
    ]
    for rule, path, want in cases:
        assert _rule_match(path, rule) is want, (rule, path)
        pol = RobotsPolicy({"h.test": RobotsRules(disallow=(rule,))})
        got = not pol.allowed(["h.test"], [path])[0]
        assert got is want, (rule, path)

    # longest-match with wildcards: allow '/private/ok*' (11) beats
    # disallow '/private*' (9); disallow '/private/okno$'-style longer rule
    # would win back — pattern length decides, allow wins ties
    pol = RobotsPolicy(
        {"h.test": RobotsRules(disallow=("/private*",), allow=("/private/ok*",))}
    )
    hosts = np.array(["h.test"] * 3, dtype=object)
    paths = np.array(["/private/x", "/private/ok/y", "/pub"], dtype=object)
    assert pol.allowed(hosts, paths).tolist() == [False, True, True]
    # update() invalidates the compiled-rule cache
    pol.update("h.test", RobotsRules(disallow=("/pub*",)))
    assert pol.allowed(hosts, paths).tolist() == [True, True, False]


def test_robots_wildcard_engine_oracle_agreement():
    """Property check: engine vectorized matcher ≡ oracle scanner on random
    rule/path pairs built from a small alphabet (catches translation bugs)."""
    import itertools

    from crawler_ray.oracle import _rule_match
    from crawler_ray.state.robots import RobotsPolicy, RobotsRules

    alpha = ["a", "b", "*", ""]
    paths = ["/" + "".join(p) for p in itertools.product("ab", repeat=4)]
    rules = set()
    for parts in itertools.product(alpha, repeat=3):
        r = "/" + "".join(parts)
        rules.add(r)
        rules.add(r + "$")
    for rule in sorted(rules):
        pol = RobotsPolicy({"h.test": RobotsRules(disallow=(rule,))})
        eng = [not x for x in pol.allowed(["h.test"] * len(paths), paths)]
        orc = [_rule_match(p, rule) for p in paths]
        assert eng == orc, rule


def test_robots_user_agent_groups():
    from crawler_ray.state.robots import RobotsPolicy

    lines = [
        "User-agent: *",
        "Disallow: /all",
        "Crawl-delay: 100",
        "",
        "User-agent: crawler_ray",
        "User-agent: otherbot",
        "Disallow: /mine",
        "Allow: /mine/ok",
        "Crawl-delay: 700",
    ]
    mine = RobotsPolicy.parse_robots_lines(lines, agent="crawler_ray/0.1")
    assert mine.disallow == ("/mine",)
    assert mine.allow == ("/mine/ok",)
    assert mine.crawl_delay_ms == 700
    other = RobotsPolicy.parse_robots_lines(lines, agent="somebody/2.0")
    assert other.disallow == ("/all",)
    assert other.crawl_delay_ms == 100
    # groupless lines (the corpus robots.txt model) belong to '*'
    plain = RobotsPolicy.parse_robots_lines(
        ["Disallow: /page-000", "Crawl-delay: 2000"], agent="crawler_ray/0.1"
    )
    assert plain.disallow == ("/page-000",)
    assert plain.crawl_delay_ms == 2000
    # comments stripped
    assert RobotsPolicy.parse_robots_lines(["Disallow: /x # why"]).disallow == ("/x",)
