"""Politeness-aware frontier selection (SURVEY.md T3/A1/O1/O3; reference:
spider's per-host `delay` throttle, /root/reference/src/scanner/scan.rs:26,
proto/crawler.proto:26).

Each round models a ``round_ms`` politeness window. A host with effective
delay d admits ``max(1, round_ms // d)`` fetches; its remaining frontier rows
defer to the next round with their original depth. Selection within a host is
deterministic: (depth, url) ascending — the priority ordering O1.

Distributed shape (skew-safe by construction, no groupby shuffle at all):
  * **Stage A — per-batch combiner**: every block independently marks its
    local per-host top-q by (depth, url); non-top rows defer immediately.
    The union of per-block top-q always contains the global top-q, and a hot
    host can contribute at most q rows per block — the skew bound the old
    salted two-stage top-k provided, without any shuffle.
  * **Stage B — tree reduce**: stage-A survivors (≤ blocks × q per host —
    tiny next to the frontier, since q is the host's per-round fetch quota)
    are folded to one block (optionally via an intermediate combiner level
    when large) where the same vectorized kernel computes the exact global
    per-host top-q. Result equals the driver-side :func:`select_small`.

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

# stage-A survivors above this fold through one intermediate combiner level
# before the final exact block (keeps the last task's input bounded)
_TREE_FOLD_THRESHOLD = 2_000_000


def limited_hosts(cfg: CrawlConfig, policy: RobotsPolicy) -> set[str] | None:
    """Hosts subject to a finite quota. None ⇒ ALL hosts are limited
    (job-level delay). Empty set ⇒ no politeness at all (fast path)."""
    if cfg.delay_ms > 0:
        return None
    if not cfg.respect_robots_txt:
        return set()
    return {h for h, r in policy.rules.items() if r.crawl_delay_ms > 0}


def quota_for(host: str, cfg: CrawlConfig, policy: RobotsPolicy) -> int | None:
    d = cfg.delay_ms
    if cfg.respect_robots_txt:
        d = policy.effective_delay_ms(host, d)
    return None if d <= 0 else max(1, cfg.round_ms // d)


def _rank_keep_mask(
    url: np.ndarray,
    host: np.ndarray,
    depth: np.ndarray,
    limited_mask: np.ndarray,
    cfg: CrawlConfig,
    policy: RobotsPolicy,
) -> np.ndarray:
    """keep[i] = True iff row i is unlimited OR within its host's per-round
    quota ranked by (depth, url). Vectorized over all hosts at once
    (lexsort + grouped cumcount) — the shared kernel of the driver-side and
    distributed selection paths."""
    n = len(url)
    keep = np.ones(n, dtype=bool)
    idx = np.flatnonzero(limited_mask)
    if not len(idx):
        return keep
    order = idx[np.lexsort((url[idx], depth[idx]))]
    s = pd.Series(host[order])
    ranks = s.groupby(s, sort=False).cumcount().to_numpy()
    big = np.iinfo(np.int64).max
    qmap = {
        h: (q if (q := quota_for(h, cfg, policy)) is not None else big)
        for h in pd.unique(s)
    }
    q = s.map(qmap).to_numpy(dtype=np.int64)
    keep[order] = ranks < q
    return keep


def select_small(tab: pa.Table, cfg: CrawlConfig, policy: RobotsPolicy):
    """Driver-side selection over one Arrow table — same quota + (depth, url)
    ordering rule as :func:`select_frontier`; used by the engine's
    small-round coordinator path and as the test oracle for the distributed
    selection."""
    lim = limited_hosts(cfg, policy)
    if lim is not None and not lim:
        return tab, None
    url = tab.column("url").to_numpy(zero_copy_only=False)
    host = tab.column("host").to_numpy(zero_copy_only=False)
    depth = tab.column("depth").to_numpy(zero_copy_only=False)
    if lim is None:
        limited_mask = np.ones(tab.num_rows, dtype=bool)
    else:
        limited_mask = np.isin(host, np.array(sorted(lim), dtype=object))
    keep = _rank_keep_mask(url, host, depth, limited_mask, cfg, policy)
    if keep.all():
        return tab, None
    sel = tab.filter(pa.array(keep))
    deferred = tab.filter(pa.array(~keep))
    return sel, (deferred if deferred.num_rows else None)


def select_frontier(frontier, cfg: CrawlConfig, policy: RobotsPolicy):
    """frontier (materialized Dataset) → (selected, deferred) Datasets.

    ``deferred`` is None when every row was selected."""
    lim = limited_hosts(cfg, policy)
    if lim is not None and not lim:
        return frontier, None
    lim_np = None if lim is None else np.array(sorted(lim), dtype=object)

    def mark(t: pa.Table) -> pa.Table:
        """Append sel (kept by local ranking) and fin (unlimited — final,
        bypasses stage B) marker columns."""
        url = t.column("url").to_numpy(zero_copy_only=False)
        host = t.column("host").to_numpy(zero_copy_only=False)
        depth = t.column("depth").to_numpy(zero_copy_only=False)
        if lim_np is None:
            limited_mask = np.ones(t.num_rows, dtype=bool)
        else:
            limited_mask = np.isin(host, lim_np)
        keep = _rank_keep_mask(url, host, depth, limited_mask, cfg, policy)
        t = t.append_column("sel", pa.array(keep))
        return t.append_column("fin", pa.array(~limited_mask))

    def split(ds, expr):
        return ds.map_batches(
            lambda t: t.filter(expr(t)).drop_columns(["sel", "fin"]),
            batch_format="pyarrow",
        )

    # stage A: shuffle-free per-block combiner
    marked = frontier.map_batches(mark, batch_format="pyarrow").materialize()
    unlimited = split(marked, lambda t: t["fin"])
    cand = split(marked, lambda t: pc.and_(t["sel"], pc.invert(t["fin"]))).materialize()
    deferred_parts = [split(marked, lambda t: pc.invert(t["sel"]))]

    # single-block frontier: the per-block top-q IS the global top-q — skip
    # the tree reduce (saves ~2 sequential Ray ops per politeness round)
    if marked.num_blocks() <= 1:
        deferred = deferred_parts[0].materialize()
        selected = (unlimited.union(cand) if lim is not None else cand).materialize()
        return selected, (deferred if deferred.count() else None)

    # stage B: tree-reduce stage-A survivors to the exact global top-q
    n_cand = cand.count()
    if n_cand == 0:
        selected = unlimited.materialize()
        deferred = deferred_parts[0].materialize()
        return selected, (deferred if deferred.count() else None)
    if n_cand > _TREE_FOLD_THRESHOLD:
        import ray

        fold = max(2, int(ray.cluster_resources().get("CPU", 4)))
        folded = (
            cand.repartition(fold).map_batches(mark, batch_format="pyarrow").materialize()
        )
        deferred_parts.append(split(folded, lambda t: pc.invert(t["sel"])))
        cand = split(folded, lambda t: t["sel"]).materialize()
    exact = (
        cand.repartition(1)
        .map_batches(mark, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    sel_lim = split(exact, lambda t: t["sel"])
    deferred_parts.append(split(exact, lambda t: pc.invert(t["sel"])))

    deferred = deferred_parts[0]
    for p in deferred_parts[1:]:
        deferred = deferred.union(p)
    deferred = deferred.materialize()
    selected = (unlimited.union(sel_lim) if lim is not None else sel_lim).materialize()
    return selected, (deferred if deferred.count() else None)
