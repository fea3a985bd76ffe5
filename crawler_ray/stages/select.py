"""Politeness-aware frontier selection (SURVEY.md T3/A1/O1/O3; reference:
spider's per-host `delay` throttle, /root/reference/src/scanner/scan.rs:26,
proto/crawler.proto:26).

Each round models a ``round_ms`` politeness window. A host with effective
delay d admits ``max(1, round_ms // d)`` fetches; its remaining frontier rows
defer to the next round with their original depth. Selection within a host is
deterministic: (depth, url) ascending — the priority ordering O1.

Skew handling (north rule / SURVEY §4): per-host top-q is computed with a
**salted two-stage top-k** — stage A ranks within ``(host, salt)`` buckets
(``salt = hash(url) % S``) so one hot host spreads across S groups; stage B
ranks the ≤ S·q stage-A survivors per host. The union of per-bucket top-q
always contains the global top-q, so the result is exactly the unsalted
answer. Quotas are per-host-global and computed BEFORE salting (§7.4.4).

Hosts with no effective delay bypass selection entirely (no shuffle) — the
common path when the job sets ``delay_ms=0`` and robots impose no delay.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import CrawlConfig
from ..state.robots import RobotsPolicy
from ..state.seen import stable_hash64


def limited_hosts(cfg: CrawlConfig, policy: RobotsPolicy) -> set[str] | None:
    """Hosts subject to a finite quota. None ⇒ ALL hosts are limited
    (job-level delay). Empty set ⇒ no politeness at all (fast path)."""
    if cfg.delay_ms > 0:
        return None
    if not cfg.respect_robots_txt:
        return set()
    return {h for h, (_, d) in policy.rules.items() if d > 0}


def quota_for(host: str, cfg: CrawlConfig, policy: RobotsPolicy) -> int | None:
    d = cfg.delay_ms
    if cfg.respect_robots_txt:
        d = policy.effective_delay_ms(host, d)
    return None if d <= 0 else max(1, cfg.round_ms // d)


def _mark_top(group: pd.DataFrame, q: int, col: str) -> pd.DataFrame:
    order = np.lexsort((group["url"].to_numpy(), group["depth"].to_numpy()))
    sel = np.zeros(len(group), dtype=bool)
    sel[order[:q]] = True
    group = group.copy()
    group[col] = sel
    return group


def select_small(tab: pa.Table, cfg: CrawlConfig, policy: RobotsPolicy):
    """Driver-side selection over one Arrow table — same quota + (depth, url)
    ordering rule as :func:`select_frontier`; used by the engine's
    small-round coordinator path and as the test oracle for the distributed
    selection."""
    n = tab.num_rows
    lim = limited_hosts(cfg, policy)
    if lim is not None and not lim:
        return tab, None
    url = tab.column("url").to_numpy(zero_copy_only=False)
    host = tab.column("host").to_numpy(zero_copy_only=False)
    depth = tab.column("depth").to_numpy(zero_copy_only=False)
    if lim is None:
        limited_mask = np.ones(n, dtype=bool)
    else:
        limited_mask = np.isin(host, np.array(sorted(lim), dtype=object))
    lim_idx = np.flatnonzero(limited_mask)
    if len(lim_idx) == 0:
        return tab, None
    order = lim_idx[np.lexsort((url[lim_idx], depth[lim_idx]))]
    s = pd.Series(host[order])
    ranks = s.groupby(s, sort=False).cumcount().to_numpy()
    qmap = {h: quota_for(h, cfg, policy) for h in pd.unique(s)}
    big = np.iinfo(np.int64).max
    q = s.map({h: (v if v is not None else big) for h, v in qmap.items()}).to_numpy(
        dtype=np.int64
    )
    selm = ranks < q
    sel_idx = np.concatenate([np.flatnonzero(~limited_mask), order[selm]])
    def_idx = order[~selm]
    sel = tab.take(pa.array(np.sort(sel_idx)))
    deferred = tab.take(pa.array(np.sort(def_idx))) if len(def_idx) else None
    return sel, deferred


def select_frontier(frontier, cfg: CrawlConfig, policy: RobotsPolicy):
    """frontier (materialized Dataset) → (selected, deferred) Datasets.

    ``deferred`` is None when every row was selected."""
    lim = limited_hosts(cfg, policy)
    if lim is not None and not lim:
        return frontier, None

    if lim is None:
        unlimited, limited = None, frontier
    else:
        lim_list = sorted(lim)
        unlimited = frontier.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["host"], pa.array(lim_list)))),
            batch_format="pyarrow",
        )
        limited = frontier.map_batches(
            lambda t: t.filter(pc.is_in(t["host"], pa.array(lim_list))),
            batch_format="pyarrow",
        ).materialize()
        if limited.count() == 0:
            return frontier, None

    S = max(1, cfg.salt_buckets)

    def add_salt(t: pa.Table) -> pa.Table:
        urls = t.column("url").combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "salt", pa.array((stable_hash64(urls) % S).astype(np.int64))
        )

    def mark_a(g: pd.DataFrame) -> pd.DataFrame:
        q = quota_for(g["host"].iat[0], cfg, policy)
        return _mark_top(g, q, "cand")

    def mark_b(g: pd.DataFrame) -> pd.DataFrame:
        q = quota_for(g["host"].iat[0], cfg, policy)
        return _mark_top(g, q, "sel")

    stage_a = (
        limited.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["host", "salt"])
        .map_groups(mark_a, batch_format="pandas")
        .materialize()
    )
    cand = stage_a.map_batches(
        lambda t: t.filter(t["cand"]).drop_columns(["salt", "cand"]),
        batch_format="pyarrow",
    )
    defer1 = stage_a.map_batches(
        lambda t: t.filter(pc.invert(t["cand"])).drop_columns(["salt", "cand"]),
        batch_format="pyarrow",
    )
    stage_b = (
        cand.groupby("host").map_groups(mark_b, batch_format="pandas").materialize()
    )
    sel_lim = stage_b.map_batches(
        lambda t: t.filter(t["sel"]).drop_columns(["sel"]),
        batch_format="pyarrow",
    )
    defer2 = stage_b.map_batches(
        lambda t: t.filter(pc.invert(t["sel"])).drop_columns(["sel"]),
        batch_format="pyarrow",
    )
    deferred = defer1.union(defer2).materialize()
    selected = sel_lim if unlimited is None else unlimited.union(sel_lim)
    return selected.materialize(), (deferred if deferred.count() else None)
