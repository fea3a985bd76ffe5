"""Candidate link filtering + per-round unique (SURVEY.md M4/M5/O2, A3/D1
pre-stage). Reference semantics: spider applies scope/blacklist/robots
predicates to every discovered link before enqueue (config at
/root/reference/src/scanner/scan.rs:25-38 from proto/crawler.proto:17-27).

Two pieces:
  * ``make_candidate_filter`` — vectorized map_batches predicate: scope
    (same-host / subdomains / tld), regex blacklist, robots disallow, depth
    limit. The robots policy is a tiny broadcast object captured in the
    closure (J3 broadcast-small-side).
  * per-batch combiner for the per-round unique-by-url with deterministic
    winner (min depth, then min src): vectorized sort + drop_duplicates, with
    the survivor's (depth, src) packed into one lexically ordered string.
    The *global* argmin happens on the SeenShard actors via claim/harvest
    (stages/dedup.py) — no groupby shuffle (SURVEY §2.5 pre-aggregate
    pattern pushed all the way into the stateful stage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import urlnorm
from ..config import CrawlConfig
from ..state.robots import RobotsPolicy


def make_candidate_filter(cfg: CrawlConfig, seed_host: str, policy: RobotsPolicy):
    """links batch (src,dst,dst_host,depth,crawl_id) → admissible candidates."""

    def filter_batch(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        dst = batch.column("dst").combine_chunks()
        hosts = batch.column("dst_host").combine_chunks()
        keep = urlnorm.in_scope(
            hosts, seed_host, subdomains=cfg.subdomains, tld=cfg.tld
        )
        if cfg.blacklist:
            keep = pc.and_(
                keep, pc.invert(urlnorm.blacklist_mask(dst, list(cfg.blacklist)))
            )
        if cfg.max_depth >= 0:
            keep = pc.and_(
                keep,
                pc.less_equal(batch.column("depth"), pa.scalar(cfg.max_depth, pa.int32())),
            )
        keep_np = keep.to_numpy(zero_copy_only=False)
        if cfg.respect_robots_txt and policy.rules:
            paths = urlnorm.path_of(dst).to_numpy(zero_copy_only=False)
            hosts_np = hosts.to_numpy(zero_copy_only=False)
            sub = np.flatnonzero(keep_np)
            if len(sub):
                ok = policy.allowed(hosts_np[sub], paths[sub])
                keep_np[sub[~ok]] = False
        return batch.filter(pa.array(keep_np))

    return filter_batch


def combine_candidates_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per dst with the lexically-min packed
    (depth, src) key. Dedups FIRST (vectorized sort + drop_duplicates), packs
    only the survivors — shrinks both the string work and the global shuffle."""
    if len(batch) == 0:
        return pa.table({"dst": pa.array([], pa.string()), "pack": pa.array([], pa.string())})
    df = pd.DataFrame(
        {
            "dst": batch.column("dst").to_numpy(zero_copy_only=False),
            "depth": batch.column("depth").to_numpy(zero_copy_only=False),
            "src": batch.column("src").to_numpy(zero_copy_only=False),
        }
    )
    df = df.sort_values(["dst", "depth", "src"], kind="mergesort").drop_duplicates(
        "dst", keep="first"
    )
    pack = df["depth"].astype("int64").astype(str).str.zfill(10) + "|" + df["src"]
    out = pd.DataFrame({"dst": df["dst"].to_numpy(), "pack": pack.to_numpy()})
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
