"""robots.txt rules + per-host politeness (SURVEY.md S5/T2/T3; reference:
`respect_robots_txt` + `delay` config at /root/reference/src/scanner/scan.rs:25-26,
from proto/crawler.proto:21,26 — spider evaluates full robots semantics via
its robotparser dependency).

The rules table is tiny (one row per host) so it is a broadcast small side
(SURVEY J3): the driver reads it once, ``ray.put``s the policy, and gate
stages look it up per batch — no shuffle.

Rules model: RFC 9309 semantics including §2.2.3 special characters — per
host an ``allow``/``disallow`` rule set evaluated by LONGEST MATCH (allow
wins ties; rule length = raw pattern octets), where ``*`` matches any
character sequence and a trailing ``$`` anchors the rule to the end of the
path, plus an optional crawl-delay that overrides the job delay when larger.
Plain prefix rules stay on a vectorized numpy ``startswith`` fast path;
wildcard rules compile ONCE per host to anchored regexes (cached on the
policy, invalidated by :meth:`update`, still a broadcast small side).
``parse_robots_lines`` understands ``User-agent`` groups: rules apply from
the most specific group matching the crawl's agent (longest matching group
token; ``*`` is the fallback; leading rules with no group belong to ``*``).
The FIXTURES.md §3 tables carry disallow+delay only; allow/UA-group behavior
is pinned by unit tests.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import numpy as np
import pyarrow as pa


def _has_wildcard(pattern: str) -> bool:
    return "*" in pattern or pattern.endswith("$")


def robots_rule_regex(pattern: str) -> str:
    """Translate an RFC 9309 §2.2.3 rule to an (implicitly start-anchored)
    regex: ``*`` → ``.*``, trailing ``$`` → end anchor, everything else
    literal (a mid-pattern ``$`` is an ordinary octet). Matched with
    ``re.match`` so the prefix anchoring is structural."""
    anchor_end = pattern.endswith("$")
    body = pattern[:-1] if anchor_end else pattern
    rx = ".*".join(re.escape(seg) for seg in body.split("*"))
    # \Z, not $: the re '$' also matches before a trailing newline, which
    # would diverge from RFC end-of-path semantics (and from the oracle's
    # endswith matcher) on a path retaining a raw '\n'
    return rx + (r"\Z" if anchor_end else "")


class RobotsRules(NamedTuple):
    """Tuple-compatible ([0]=disallow, [1]=crawl_delay_ms) rule set."""

    disallow: tuple = ()
    crawl_delay_ms: int = 0
    allow: tuple = ()


def _as_rules(rules) -> RobotsRules:
    if isinstance(rules, RobotsRules):
        return rules
    return RobotsRules(tuple(rules[0]), int(rules[1]), tuple(rules[2]) if len(rules) > 2 else ())


class RobotsPolicy:
    """Parsed per-host robots rules with vectorized gate checks."""

    def __init__(self, rules: dict):
        # host -> RobotsRules (plain (disallow, delay) tuples auto-upgrade)
        self.rules = {h: _as_rules(r) for h, r in rules.items()}
        # host -> [(is_allow, rule_len, prefix_str | compiled_regex)], built
        # lazily per host; regexes pickle as pattern+flags so the cache
        # survives the ray.put broadcast
        self._compiled: dict[str, list] = {}

    def _host_matchers(self, host: str, r: RobotsRules) -> list:
        got = self._compiled.get(host)
        if got is None:
            got = []
            # disallow before allow so the >= update lets allow win length
            # ties (RFC 9309: least restrictive rule on a specificity tie)
            for is_allow, rule_set in ((False, r.disallow), (True, r.allow)):
                for p in rule_set:
                    m = re.compile(robots_rule_regex(p)) if _has_wildcard(p) else p
                    got.append((is_allow, len(p), m))
            self._compiled[host] = got
        return got

    @classmethod
    def from_table(cls, table: pa.Table | None) -> "RobotsPolicy":
        if table is None:
            return cls({})
        rules = {}
        for row in table.to_pylist():
            rules[row["host"].lower()] = RobotsRules(
                tuple(row["disallow"] or ()),
                int(row["crawl_delay_ms"] or 0),
                tuple(row.get("allow") or ()),
            )
        return cls(rules)

    @staticmethod
    def parse_robots_lines(lines: list[str], agent: str = "*") -> RobotsRules:
        """Parse robots.txt rule lines → :class:`RobotsRules` for ``agent``.

        RFC 9309 group selection: consecutive ``User-agent`` lines open a
        group; the group whose token is the longest prefix of the agent's
        product token wins, ``*`` is the fallback. Rules before any
        ``User-agent`` line belong to the ``*`` group (the corpus robots.txt
        docs are written groupless). Delay unit is ms in this corpus model."""
        product = agent.split("/")[0].strip().lower()
        groups: dict[str, RobotsRules] = {}
        cur_tokens = ["*"]
        in_ua_run = False

        def add(tok, **kw):
            g = groups.get(tok, RobotsRules())
            groups[tok] = RobotsRules(
                g.disallow + kw.get("disallow", ()),
                max(g.crawl_delay_ms, kw.get("delay", 0)),
                g.allow + kw.get("allow", ()),
            )

        for line in lines:
            line = line.split("#", 1)[0]
            key, sep, val = line.partition(":")
            if not sep:
                continue
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                tok = val.lower()
                if in_ua_run:
                    cur_tokens.append(tok)
                else:
                    cur_tokens = [tok]
                in_ua_run = True
                for t in cur_tokens:
                    groups.setdefault(t, RobotsRules())
                continue
            in_ua_run = False
            if key == "disallow" and val:
                for t in cur_tokens:
                    add(t, disallow=(val,))
            elif key == "allow" and val:
                for t in cur_tokens:
                    add(t, allow=(val,))
            elif key == "crawl-delay" and val:
                try:
                    d = int(float(val))
                except ValueError:
                    continue
                for t in cur_tokens:
                    add(t, delay=d)

        best = None
        for tok in groups:
            if tok != "*" and product.startswith(tok):
                if best is None or len(tok) > len(best):
                    best = tok
        return groups.get(best if best is not None else "*", RobotsRules())

    def update(self, host: str, rules) -> None:
        host = host.lower()
        self.rules[host] = _as_rules(rules)
        self._compiled.pop(host, None)

    def allowed(self, hosts: list[str] | np.ndarray, paths: list[str] | np.ndarray) -> np.ndarray:
        """Bool mask: True where host robots rules allow the path.

        Longest-match evaluation (RFC 9309): the longest allow/disallow rule
        matching the path decides; allow wins length ties; no match ⇒
        allowed. ``*`` / trailing ``$`` wildcards are supported (§2.2.3).
        Vectorized per distinct host in the batch (few hosts per batch):
        plain prefix rules are one numpy startswith over the host's rows;
        wildcard rules run a per-host pre-compiled anchored regex."""
        hosts = np.asarray(hosts, dtype=object)
        paths = np.asarray(paths, dtype=object)
        out = np.ones(len(hosts), dtype=bool)
        if not self.rules:
            return out
        for host in np.unique(hosts):
            r = self.rules.get(host)
            if r is None or (not r.disallow and not r.allow):
                continue
            idx = np.flatnonzero(hosts == host)
            hp = paths[idx].astype(str)
            best_len = np.full(len(idx), -1, dtype=np.int64)
            best_allow = np.ones(len(idx), dtype=bool)  # no match ⇒ allowed
            for is_allow, rule_len, matcher in self._host_matchers(host, r):
                if isinstance(matcher, str):
                    m = np.char.startswith(hp, matcher)
                else:
                    m = np.fromiter(
                        (matcher.match(p) is not None for p in hp),
                        dtype=bool,
                        count=len(hp),
                    )
                upd = m & (rule_len >= best_len)
                best_len[upd] = rule_len
                best_allow[upd] = is_allow
            out[idx[~best_allow]] = False
        return out

    def effective_delay_ms(self, host: str, base_delay_ms: int) -> int:
        """Job delay, overridden by robots crawl-delay when larger
        (FIXTURES.md §3)."""
        r = self.rules.get(host)
        return max(base_delay_ms, r.crawl_delay_ms if r else 0)


def plan_quotas(
    host_counts: dict[str, int],
    policy: RobotsPolicy,
    base_delay_ms: int,
    round_ms: int,
    respect_robots: bool = True,
) -> dict[str, int | None]:
    """Per-host fetch quota for one scheduler round (T3).

    A round models a ``round_ms`` wall-clock politeness window: a host with
    effective delay d ms admits ``max(1, round_ms // d)`` fetches per round;
    delay 0 ⇒ unlimited (None). Quotas are computed per-host-globally (SURVEY
    §7.4 hard-part 4)."""
    quotas: dict[str, int | None] = {}
    for host, n in host_counts.items():
        d = policy.effective_delay_ms(host, base_delay_ms) if respect_robots else base_delay_ms
        quotas[host] = None if d <= 0 else max(1, round_ms // d)
    return quotas


def required_round_ms(
    host_counts: dict[str, int],
    policy: RobotsPolicy,
    base_delay_ms: int,
    respect_robots: bool = True,
) -> int:
    """Wall-clock floor of one round under real politeness: the slowest
    host's ``n_selected × effective_delay`` ms (T3 wallclock mode — the
    reference sleeps ``delay`` ms between same-host requests,
    proto/crawler.proto:26). Hosts with no effective delay contribute 0."""
    req = 0
    for host, n in host_counts.items():
        d = policy.effective_delay_ms(host, base_delay_ms) if respect_robots else base_delay_ms
        if d > 0:
            req = max(req, int(n) * d)
    return req
