"""robots.txt rules + per-host politeness (SURVEY.md S5/T2/T3; reference:
`respect_robots_txt` + `delay` config at /root/reference/src/scanner/scan.rs:25-26,
from proto/crawler.proto:21,26).

The rules table is tiny (one row per host) so it is a broadcast small side
(SURVEY J3): the driver reads it once, ``ray.put``s the policy, and gate
stages look it up per batch — no shuffle.

Rules model (FIXTURES.md §3): per host a list of disallowed path *prefixes*
plus an optional crawl-delay that overrides the job delay when larger.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class RobotsPolicy:
    """Parsed per-host robots rules with vectorized gate checks."""

    def __init__(self, rules: dict[str, tuple[tuple[str, ...], int]]):
        # host -> (disallow prefixes, crawl_delay_ms)
        self.rules = rules

    @classmethod
    def from_table(cls, table: pa.Table | None) -> "RobotsPolicy":
        if table is None:
            return cls({})
        rules = {}
        for row in table.to_pylist():
            rules[row["host"].lower()] = (
                tuple(row["disallow"] or ()),
                int(row["crawl_delay_ms"] or 0),
            )
        return cls(rules)

    @staticmethod
    def parse_robots_lines(lines: list[str]) -> tuple[tuple[str, ...], int]:
        """Parse robots.txt rule lines (the corpus robots.txt doc's text
        spans) → (disallow prefixes, crawl_delay_ms). Recognises
        ``Disallow: <prefix>`` and ``Crawl-delay: <ms>`` (unit is ms in this
        corpus model); everything else is ignored."""
        disallow: list[str] = []
        delay = 0
        for line in lines:
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "disallow" and val:
                disallow.append(val)
            elif key == "crawl-delay" and val:
                try:
                    delay = max(delay, int(float(val)))
                except ValueError:
                    pass
        return tuple(disallow), delay

    def update(self, host: str, rules: tuple[tuple[str, ...], int]) -> None:
        self.rules[host.lower()] = rules

    def allowed(self, hosts: list[str] | np.ndarray, paths: list[str] | np.ndarray) -> np.ndarray:
        """Bool mask: True where host robots rules allow the path.

        Vectorized per distinct host in the batch (few hosts per batch; each
        check is a numpy startswith over the host's rows)."""
        hosts = np.asarray(hosts, dtype=object)
        paths = np.asarray(paths, dtype=object)
        out = np.ones(len(hosts), dtype=bool)
        if not self.rules:
            return out
        for host in np.unique(hosts):
            prefixes = self.rules.get(host, ((), 0))[0]
            if not prefixes:
                continue
            idx = np.flatnonzero(hosts == host)
            hp = paths[idx].astype(str)
            bad = np.zeros(len(idx), dtype=bool)
            for p in prefixes:
                bad |= np.char.startswith(hp, p)
            out[idx[bad]] = False
        return out

    def effective_delay_ms(self, host: str, base_delay_ms: int) -> int:
        """Job delay, overridden by robots crawl-delay when larger
        (FIXTURES.md §3)."""
        return max(base_delay_ms, self.rules.get(host, ((), 0))[1])


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
    delay 0 ⇒ unlimited (None). Quotas are computed per-host-globally BEFORE
    any hot-host salting (SURVEY §7.4 hard-part 4)."""
    quotas: dict[str, int | None] = {}
    for host, n in host_counts.items():
        d = policy.effective_delay_ms(host, base_delay_ms) if respect_robots else base_delay_ms
        quotas[host] = None if d <= 0 else max(1, round_ms // d)
    return quotas
