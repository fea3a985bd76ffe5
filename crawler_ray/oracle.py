"""Single-process oracle crawler (SURVEY.md §5.2) — defines ground truth for
the Ray engine. Reimplements the reference crawl semantics (spider 2.0.12 wave
BFS: fetch frontier → parse → extract links → dedup vs visited → next frontier;
call-sites /root/reference/src/scanner/scan.rs:71-77, crawl.rs:32-44) as ~150
lines of plain Python over the synthetic corpus: dict corpus, set visited,
per-host politeness quotas.

Deliberately independent of the engine's vectorized code paths: URL handling
uses ``urllib.parse`` directly, filters are plain loops. The engine must match
this module exactly on visited set, BFS waves, and per-row span sequences.

Shared deterministic scheduling contract (both sides implement it):
  * rounds model a ``round_ms`` politeness window; host quota =
    ``max(1, round_ms // effective_delay)`` (unlimited when delay 0);
  * within a host, URLs are fetched in (depth, url) order; carryover keeps
    its original depth;
  * global ``max_pages`` budget applied in (depth, url) order;
  * per-round candidates are uniqued by url keeping (min depth, then min src)
    before the seen-set check (first-wins determinism).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit

from .config import CrawlConfig


def norm(url: str, base: str | None = None) -> str | None:
    url = url.strip()
    if base is not None and "://" not in url.split("#")[0].split("?")[0][:12]:
        url = urljoin(base, url)
    parts = urlsplit(url)
    if not parts.scheme or not parts.netloc:
        return None
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and not (
        (scheme == "https" and port == 443) or (scheme == "http" and port == 80)
    ):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    q = f"?{parts.query}" if parts.query else ""
    return f"{scheme}://{netloc}{path}{q}"


def host_of(url: str) -> str:
    return (urlsplit(url).hostname or "").lower()


def path_of(url: str) -> str:
    p = urlsplit(url)
    return (p.path or "/") + (f"?{p.query}" if p.query else "")


def stem(host: str) -> str:
    from .urlnorm import stem_of_host  # shared PSL rule engine

    return stem_of_host(host)


def _rule_match(path: str, rule: str) -> bool:
    """RFC 9309 §2.2.3 rule match, implemented independently of the engine's
    regex translation (state/robots.py): prefix-anchored scan where ``*``
    matches any sequence and a trailing ``$`` anchors the end. Greedy
    leftmost placement of the middle segments is sufficient for existence."""
    end_anchor = rule.endswith("$")
    body = rule[:-1] if end_anchor else rule
    segs = body.split("*")
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    if len(segs) == 1:
        return len(path) == pos if end_anchor else True
    for seg in segs[1:-1]:
        if seg:
            i = path.find(seg, pos)
            if i < 0:
                return False
            pos = i + len(seg)
    last = segs[-1]
    if end_anchor:
        return path.endswith(last) and len(path) - len(last) >= pos
    return True if not last else path.find(last, pos) >= 0


@dataclass
class OracleResult:
    visited: set = field(default_factory=set)
    # fetched rows in fetch order: (url, depth, round, status, spans)
    fetched: list = field(default_factory=list)
    waves: dict = field(default_factory=dict)  # url -> depth
    rounds: dict = field(default_factory=dict)  # url -> fetch round
    links: list = field(default_factory=list)  # (src, dst) in emission order


def crawl(
    corpus: dict[str, list[dict]],
    cfg: CrawlConfig,
    robots: dict[str, tuple[tuple[str, ...], int]] | None = None,
) -> OracleResult:
    """Run the oracle crawl. ``corpus`` maps doc_id → span dict list;
    ``robots`` maps host → (disallow prefixes, crawl_delay_ms)."""
    robots = robots or {}
    blacklist = [re.compile(p) for p in cfg.blacklist]
    res = OracleResult()

    def robots_allowed(u: str) -> bool:
        if not cfg.respect_robots_txt:
            return True
        rules = robots.get(host_of(u), ((), 0))[0]
        return not any(_rule_match(path_of(u), r) for r in rules)

    def delay_of(host: str) -> int:
        d = cfg.delay_ms
        if cfg.respect_robots_txt:
            d = max(d, robots.get(host, ((), 0))[1])
        return d

    def admissible(u: str, seed_host: str) -> bool:
        h = host_of(u)
        ok = h == seed_host
        if not ok and cfg.subdomains:
            ok = h.endswith("." + seed_host)
        if not ok and cfg.tld:
            ok = stem(h) == stem(seed_host)
        if not ok:
            return False
        if any(rx.search(u) for rx in blacklist):
            return False
        return robots_allowed(u)

    seed = norm(cfg.url)
    if seed is None:
        return res
    seed_host = host_of(seed)

    # membership keys are case-folded whole URLs (spider's visited set is
    # case-insensitive — case_insensitive_string, Cargo.lock:289); res.visited
    # keeps the discovered casing
    seen_keys: set[str] = set()
    frontier: list[tuple[str, int]] = []  # (url, depth)
    if admissible(seed, seed_host):
        seen_keys.add(seed.lower())
        res.visited.add(seed)
        res.waves[seed] = 0
        frontier.append((seed, 0))
    if cfg.sitemap:
        sm = f"https://{seed_host}/sitemap.xml"
        if admissible(sm, seed_host) and sm.lower() not in seen_keys:
            seen_keys.add(sm.lower())
            res.visited.add(sm)
            res.waves[sm] = 0
            frontier.append((sm, 0))

    pages_fetched = 0
    rnd = 0
    while frontier:
        # --- per-host quota selection, (depth, url) order within host ---
        by_host: dict[str, list[tuple[str, int]]] = {}
        for u, d in frontier:
            by_host.setdefault(host_of(u), []).append((u, d))
        selected: list[tuple[str, int]] = []
        deferred: list[tuple[str, int]] = []
        for h, rows in by_host.items():
            rows.sort(key=lambda t: (t[1], t[0]))
            dms = delay_of(h)
            q = None if dms <= 0 else max(1, cfg.round_ms // dms)
            take = rows if q is None else rows[:q]
            selected.extend(take)
            deferred.extend(rows[len(take):])
        # --- global budget, (depth, url) order ---
        if cfg.max_pages >= 0:
            remaining = cfg.max_pages - pages_fetched
            selected.sort(key=lambda t: (t[1], t[0]))
            deferred.extend(selected[remaining:])
            selected = selected[:remaining]
            if not selected:
                break
        # --- fetch + extract ---
        # folded key -> (depth, src, dst original) — min tuple wins, matching
        # SeenShard.claim's (pack, url) argmin
        candidates: dict[str, tuple[int, str, str]] = {}
        selected.sort(key=lambda t: (t[1], t[0]))
        for u, d in selected:
            spans = corpus.get(u)
            status = 200 if spans is not None else 404
            res.fetched.append((u, d, rnd, status, spans or []))
            res.rounds[u] = rnd
            pages_fetched += 1
            if spans is None:
                continue
            for sp in spans:
                if sp["kind"] != "link":
                    continue
                dst = norm(sp["text"], base=u)
                if dst is None:
                    continue
                res.links.append((u, dst))
                if not admissible(dst, seed_host):
                    continue
                nd = d + 1
                if 0 <= cfg.max_depth < nd:
                    continue
                key = dst.lower()
                prev = candidates.get(key)
                if prev is None or (nd, u, dst) < prev:
                    candidates[key] = (nd, u, dst)
        # --- dedup vs visited (case-insensitive), enqueue novel ---
        novel = []
        for key, (nd, src, dst) in candidates.items():
            if key not in seen_keys:
                seen_keys.add(key)
                res.visited.add(dst)
                res.waves[dst] = nd
                novel.append((dst, nd))
        frontier = deferred + novel
        rnd += 1
        if rnd > 100_000:
            raise RuntimeError("oracle runaway")
    return res


def corpus_as_dict(table) -> dict[str, list[dict]]:
    """pyarrow corpus table → {doc_id: spans list} for the oracle."""
    out = {}
    for row in table.to_pylist():
        out[row["doc_id"]] = row["spans"]
    return out


def robots_as_dict(table) -> dict[str, tuple[tuple[str, ...], int]]:
    out = {}
    if table is None:
        return out
    for row in table.to_pylist():
        out[row["host"].lower()] = (
            tuple(row["disallow"] or ()),
            int(row["crawl_delay_ms"] or 0),
        )
    return out
