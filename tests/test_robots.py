"""Property tests for the RFC 9309 robots wildcard engine (VERDICT r4 #7):
adversarial rule/path pairs mixing ``*``, trailing ``$``, percent-encoding
and overlapping-length rules, checked against an INDEPENDENT greedy glob
matcher + longest-match reference (no shared regex translation), plus
scalar≡vector parity of ``RobotsPolicy.allowed``.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray.state.robots import RobotsPolicy, RobotsRules

# paths are URL paths (may carry percent-escapes and literal '$'); patterns
# additionally use the §2.2.3 specials '*' and trailing '$'
_PATH_ALPHA = "ab/%2A$"
_PAT_ALPHA = "ab/%2A$*"

paths_st = st.text(alphabet=_PATH_ALPHA, min_size=0, max_size=10)
patterns_st = st.text(alphabet=_PAT_ALPHA, min_size=0, max_size=8)


def _glob_match(pattern: str, path: str) -> bool:
    """Independent RFC 9309 rule matcher: prefix-anchored, '*' matches any
    sequence, trailing '$' anchors the end. Greedy leftmost segment scan —
    the textbook glob algorithm, no regex."""
    anchor = pattern.endswith("$")
    body = pattern[:-1] if anchor else pattern
    segs = body.split("*")
    if len(segs) == 1:
        return path == body if anchor else path.startswith(body)
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    end = len(path)
    if anchor:
        last = segs[-1]
        if not path.endswith(last):
            return False
        end = len(path) - len(last)
        if end < pos:
            return False
        segs = segs[:-1]
    for seg in segs[1:]:
        i = path.find(seg, pos, end)
        if i < 0:
            return False
        pos = i + len(seg)
    return True


def _ref_allowed(rules: RobotsRules, path: str) -> bool:
    """Longest-match reference: the longest matching rule decides, allow
    wins length ties, no match ⇒ allowed."""
    best_d = max((len(p) for p in rules.disallow if _glob_match(p, path)), default=-1)
    best_a = max((len(p) for p in rules.allow if _glob_match(p, path)), default=-1)
    if best_d < 0 and best_a < 0:
        return True
    return best_a >= best_d


@settings(max_examples=300, deadline=None)
@given(
    disallow=st.lists(patterns_st, max_size=5),
    allow=st.lists(patterns_st, max_size=5),
    paths=st.lists(paths_st, min_size=1, max_size=8),
)
def test_robots_wildcard_matches_reference(disallow, allow, paths):
    rules = RobotsRules(tuple(disallow), 0, tuple(allow))
    pol = RobotsPolicy({"h.test": rules})
    hosts = np.array(["h.test"] * len(paths), dtype=object)
    got = pol.allowed(hosts, np.array(paths, dtype=object))
    want = np.array([_ref_allowed(rules, p) for p in paths])
    assert got.tolist() == want.tolist(), (disallow, allow, paths)


@settings(max_examples=150, deadline=None)
@given(
    disallow=st.lists(patterns_st, max_size=4),
    allow=st.lists(patterns_st, max_size=4),
    paths=st.lists(paths_st, min_size=2, max_size=6),
)
def test_robots_scalar_vector_parity(disallow, allow, paths):
    """One big vectorized call ≡ per-path scalar calls (same policy object,
    so the compiled-matcher cache is shared — parity must not depend on
    cache state)."""
    rules = RobotsRules(tuple(disallow), 0, tuple(allow))
    pol = RobotsPolicy({"h.test": rules})
    vec = pol.allowed(
        np.array(["h.test"] * len(paths), dtype=object),
        np.array(paths, dtype=object),
    )
    scal = [
        bool(pol.allowed(np.array(["h.test"], dtype=object), np.array([p], dtype=object))[0])
        for p in paths
    ]
    assert vec.tolist() == scal


@settings(max_examples=150, deadline=None)
@given(
    pattern=patterns_st,
    path=paths_st,
    extra=st.text(alphabet=_PATH_ALPHA, min_size=1, max_size=4),
)
def test_robots_anchor_semantics(pattern, path, extra):
    """A trailing '$' must pin the match to the exact end: if an anchored
    rule matches `path`, the unanchored body also matches, and the body
    still matches any extension of `path` while the anchored form may not."""
    anchored = pattern.rstrip("$") + "$"
    body = anchored[:-1]
    if _glob_match(anchored, path):
        assert _glob_match(body, path)
        assert _glob_match(body, path + extra)
    rules_a = RobotsRules((anchored,), 0, ())
    rules_b = RobotsRules((body,), 0, ())
    pol = RobotsPolicy({"a.test": rules_a, "b.test": rules_b})
    hosts = np.array(["a.test", "b.test"], dtype=object)
    for p in (path, path + extra):
        got = pol.allowed(hosts, np.array([p, p], dtype=object))
        assert got[0] == (not _glob_match(anchored, p))
        assert got[1] == (not _glob_match(body, p))
