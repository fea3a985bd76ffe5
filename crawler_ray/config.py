"""Crawl job configuration — mirrors the reference's ``ScanRequest``
field-for-field (reference: /root/reference/proto/crawler.proto:17-27, applied
at src/rpc/server.rs:19-29 and src/scanner/scan.rs:25-38), plus the rebuild's
scheduler/scale knobs (SURVEY.md §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class CrawlConfig:
    # --- ScanRequest parity (proto/crawler.proto:17-27) ---
    url: str = ""                      # seed URL (proto `url`)
    crawl_id: str = "0"                # proto `id` (u32 user id, scan.rs:38)
    respect_robots_txt: bool = True    # proto `norobots` INVERTED (server.rs:22)
    agent: str = "crawler_ray/0.1"     # proto `agent`; UA spoof M6
    subdomains: bool = False           # proto `subdomains` (M4)
    tld: bool = False                  # proto `tld` (M4)
    proxy: str = ""                    # proto `proxy` — pass-through only (M7)
    sitemap: bool = False              # proto `sitemap` (S4/D2)
    delay_ms: int = 0                  # proto `delay` (politeness, T3)

    # --- rebuild extensions ---
    max_depth: int = -1                # -1 = unbounded (O2)
    max_pages: int = -1                # global page budget, -1 = unbounded (O3)
    round_ms: int = 1000               # politeness window one round models (T3)
    wallclock_politeness: bool = False # opt-in: pad each round's wall-clock
    # duration to max_h(n_selected_h × effective_delay_h) ms — the reference
    # sleeps `delay` ms between same-host requests (proto/crawler.proto:26);
    # aggregated per politeness window this is the same per-host request
    # rate, enforced in REAL time. Off by default: quotas alone preserve the
    # oracle-checked schedule without slowing the pipeline.
    blacklist: tuple[str, ...] = ()    # regex URL blacklist (M5)
    stop_flag_path: str = ""           # shutdown flag: checked between rounds
    # AND per fetch batch inside distributed rounds (T6, client.rs:88-99)
    post_fetch_stages: tuple[str, ...] = ()  # named result stages applied to
    # each round's fetched rows on the sink path (§2.10; stages/registry.py)

    # --- physical knobs ---
    n_seen_shards: int = 8             # T1 shard count (O(cluster cores) at scale)
    n_corpus_shards: int = 4           # fetch lookup service shards (T4)
    salt_buckets: int = 8              # retained knob; selection now bounds
    # hot hosts structurally (per-block combiner caps any host at q rows per
    # block — stages/select.py), so no salting shuffle is needed
    hot_host_threshold: int = 50_000   # (same note as salt_buckets)
    batch_size: int = 8192             # map_batches batch size
    small_round_threshold: int = 20_000  # frontier rows below which the round
    # runs driver-side with the same kernels (coordinator fast path; avoids
    # per-round distributed-execution latency). 0 forces the distributed path.
    seen_capacity: int = 1 << 17       # cuckoo capacity per shard
    checkpoint_dir: str = ""           # "" = no checkpointing
    checkpoint_every: int = 1          # rounds between checkpoints

    def with_(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)


# M6 — the reference's optional random-UA spoof (ua_generator feature,
# /root/reference/src/lib.rs:4-5, Cargo.lock:2674): agent "random" resolves to
# a deterministic pick seeded by crawl_id; any other value passes through
# (caller-supplied agent override, scan.rs:34-36).
_AGENT_POOL = (
    "Mozilla/5.0 (X11; Linux x86_64) crawler_ray/0.1",
    "Mozilla/5.0 (Macintosh) crawler_ray/0.1",
    "Mozilla/5.0 (Windows NT 10.0) crawler_ray/0.1",
    "crawler_ray/0.1 (+https://example.invalid/bot)",
)


def actor_pool_limits(cores: int | None = None) -> tuple[int, int]:
    """Cluster-derived ``(min, max)`` actor count for stateful
    ``map_batches`` pools (lang-id, quality, PII scrub, media decode).

    VERDICT r4 #2: a hard ``(2, 8)`` cap starves these stages on a big
    cluster while shard counts scale with it. Scaling rule (same spirit as
    the data-derived shuffle widths in ``pipelines/partitions.py``):
    ``min = cores // 8``, ``max = cores // 2``, floored at the old
    ``(2, 8)`` so small nodes — and the 4-cpu test session — keep the
    proven shape. 32-cpu node → (4, 16); 512-core cluster → (64, 256).
    Each pool actor is ``num_cpus=1``, so max = cores/2 leaves half the
    cluster for the surrounding read/shuffle/write stages."""
    if cores is None:
        try:
            import ray

            if ray.is_initialized():
                cores = int(ray.cluster_resources().get("CPU", 16))
            else:
                cores = 16
        except Exception:
            cores = 16
    lo = max(2, cores // 8)
    hi = max(8, cores // 2)
    return (lo, max(lo, hi))


def resolve_agent(cfg: CrawlConfig) -> str:
    if cfg.agent != "random":
        return cfg.agent
    import zlib

    return _AGENT_POOL[zlib.crc32(cfg.crawl_id.encode()) % len(_AGENT_POOL)]
