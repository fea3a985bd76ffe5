"""The crawl engine: a driver-side BFS round loop over Ray Data pipelines
(SURVEY.md §3, §7.2 step 6). Each round re-expresses one spider "wave"
(/root/reference/src/scanner/scan.rs:71-77 → spider crawl(): fetch frontier →
parse → extract links → dedup vs visited → next frontier) as:

    frontier ─select(quota/priority)─► fetched = map_batches(fetch join)
             └ deferred ┐                   │ write results (round-partitioned)
                        │             extract_links ─ candidate filter ─ combine
                        │                   │ (per-batch argmin) ─ claim→shards
                        └──────── union ── novel = SeenShard.harvest() per shard

Per-round dedup+unique costs NO sort shuffle: per-batch combiners shrink the
candidate stream, a hash-routed `claim` registers (url → min (depth,parent))
on the owning SeenShard, and `harvest` commits and emits the novel frontier
rows deterministically (claim order cannot change the arg-min).

State lives in long-lived actors created once per crawl (SeenShard × N,
CorpusShard × M) — not per-round actor pools — so per-round overhead is task
spawning only.

Two physical paths, one set of kernels and one semantics:
  * **distributed** — the Ray Data pipeline above, for rounds whose frontier
    exceeds ``cfg.small_round_threshold`` (the 100 TB path);
  * **coordinator fast path** — rounds small enough that distributed-execution
    latency would dominate run driver-side using the *same* batch kernels
    (extract_links, candidate filter, combiner, fetch/dedup routers calling
    the same actors). Deterministically identical output; tests pin both
    paths against the oracle.

Per-round atomic checkpoints {seen, frontier, host_state, lineage,
manifest-rename last} make a killed run resumable mid-frontier (north rule;
write order per SURVEY §7.4.3).

Modes (reference parity):
  run(mode='crawl')  — batch mode: crawl to completion, final link list once
                       (reference Crawl endpoint, src/rpc/server.rs:54-88,
                       crawl.rs:40-56; `full=true` analogue).
  run(mode='scan')   — streaming mode: per-round results written/callback as
                       found; between-round stop flag or a False-returning
                       callback aborts (reference Scan endpoint + "shutdown"
                       control, src/rpc/server.rs:18-52, client.rs:88-100).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import schemas
from .config import CrawlConfig, resolve_agent
from .functions.extract import extract_links
from .oracle import host_of as _host_of_one  # plain-python for single seeds
from .oracle import norm as _norm_one
from .oracle import path_of as _path_of_one
from .stages.candidates import combine_candidates_batch, make_candidate_filter
from .stages.dedup import make_claim_fn
from .stages.fetch import CorpusShard, make_fetch_fn
from .stages.select import select_frontier, select_small
from .state.robots import RobotsPolicy
from .state.seen import SeenShard, route_hash


@dataclass
class CrawlResult:
    crawl_id: str
    visited_refs: list = field(default_factory=list)  # per-shard Arrow table refs
    n_visited: int = 0
    pages_fetched: int = 0
    rounds: int = 0
    stopped: bool = False                         # aborted via stop flag / budget
    lineage: pa.Table | None = None
    out_dir: str = ""

    def visited_dataset(self):
        """The URL-seen set as a Dataset (one block per shard ref) — the
        scale path; nothing materializes on the driver."""
        import ray.data as rd

        return rd.from_arrow_refs(list(self.visited_refs))

    @property
    def visited(self) -> list:
        """Materialized sorted URL list. TEST-SCALE convenience only — at the
        10^10 design point consume :meth:`visited_dataset` instead (this
        property pulls every shard to the driver)."""
        import ray

        tabs = ray.get(list(self.visited_refs))
        return sorted(u for t in tabs for u in t.column("url").to_pylist())


def _nrows(f) -> int:
    return len(f) if isinstance(f, pa.Table) else f.count()


class CrawlEngine:
    def __init__(
        self,
        corpus_parquet: str,
        cfg: CrawlConfig,
        robots_table: pa.Table | None = None,
    ):
        import ray

        self.cfg = cfg
        self.corpus_path = corpus_parquet
        self.policy = RobotsPolicy.from_table(robots_table)
        # note: ShuffleStrategy.HASH_SHUFFLE looked faster on an isolated
        # groupby microbench but regressed the full round pipeline ~20×
        # (aggregator schema churn) — keep the default sort shuffle.
        # SeenShard: max_restarts=0 — a restarted shard would silently lose
        # the seen set; recovery is checkpoint-based resume (SURVEY §4
        # retries row). CorpusShard: stateless after __init__ (reloads its
        # hash-slice from storage), so restarts + task retries are safe.
        RSeen = ray.remote(SeenShard)
        self.seen = [
            RSeen.remote(i, cfg.seen_capacity) for i in range(cfg.n_seen_shards)
        ]
        RCorpus = ray.remote(max_restarts=2, max_task_retries=2)(CorpusShard)
        # pre-partition big corpora once so each shard actor reads ~1/N of
        # the bytes (cached across engines; small corpora skip it) — actor
        # restarts re-read the same cached partition
        from .sources.corpus import ensure_sharded

        shard_source = ensure_sharded(corpus_parquet, cfg.n_corpus_shards)
        self.corpus = [
            RCorpus.remote(shard_source, i, cfg.n_corpus_shards)
            for i in range(cfg.n_corpus_shards)
        ]
        self.agent = resolve_agent(cfg)
        self.lineage_rows: list[dict] = []
        self.pages_fetched = 0
        self.round = 0
        self.seed_host = ""
        self._resumed_frontier: pa.Table | None = None
        # robots learned by fetching /robots.txt docs from the corpus (S5/T2)
        # whenever no explicit rules table was supplied
        self._robots_from_corpus = robots_table is None and cfg.respect_robots_txt
        self._robots_loaded = False

    # ------------------------------------------------------------------ #
    def _ensure_scope_robots(self, seed_host: str) -> None:
        """Fetch + parse robots.txt from the corpus for every host the crawl
        could touch (seed host, its subdomains, tld siblings per config) —
        once per crawl, before any admissibility check. Missing robots.txt ⇒
        permissive (reference: no rules fetched means no gate)."""
        import ray

        from . import urlnorm

        if not self._robots_from_corpus or self._robots_loaded:
            return
        self._robots_loaded = True
        all_hosts = sorted(
            {h for hs in ray.get([c.hosts.remote() for c in self.corpus]) for h in hs}
        )
        if not all_hosts:
            return
        mask = urlnorm.in_scope(
            pa.array(all_hosts, pa.string()),
            seed_host,
            subdomains=self.cfg.subdomains,
            tld=self.cfg.tld,
        ).to_pylist()
        scope_hosts = sorted({h for h, m in zip(all_hosts, mask) if m} | {seed_host})
        urls = [f"https://{h}/robots.txt" for h in scope_hosts]
        n = len(urls)
        tab = pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(scope_hosts, pa.string()),
                pa.array([0] * n, pa.int32()),
                pa.array([0.0] * n, pa.float64()),
                pa.array([""] * n, pa.string()),
                pa.array([self.cfg.crawl_id] * n, pa.string()),
                pa.array([0] * n, pa.int32()),
            ],
            schema=schemas.FRONTIER,
        )
        fetched = make_fetch_fn(
            self.corpus, self.cfg.n_corpus_shards, self.cfg.crawl_id, -1, self.agent
        )(tab)
        for row in fetched.to_pylist():
            if row["status"] != 200:
                continue  # no robots.txt in corpus → permissive
            lines = [sp["text"] for sp in row["spans"] if sp["kind"] == "text"]
            self.policy.update(
                row["host"], RobotsPolicy.parse_robots_lines(lines, self.agent)
            )

    # ------------------------------------------------------------------ #
    def close(self):
        import ray

        for a in self.seen + self.corpus:
            ray.kill(a)

    def _lineage(self, stage: str, rows_in: int, rows_out: int, wall_ms: float, uri=""):
        self.lineage_rows.append(
            {
                "crawl_id": self.cfg.crawl_id,
                "round": self.round,
                "stage": stage,
                "rows_in": int(rows_in),
                "rows_out": int(rows_out),
                "wall_ms": int(wall_ms),
                "checkpoint_uri": uri,
            }
        )

    # ------------------------------------------------------------------ #
    def _admissible_seed(self, url: str, seed_host: str) -> bool:
        """Driver-side admissibility for seed-level URLs (same predicate the
        in-pipeline candidate filter applies)."""
        h = _host_of_one(url)
        ok = h == seed_host
        if not ok and self.cfg.subdomains:
            ok = h.endswith("." + seed_host)
        if not ok and self.cfg.tld:
            from .oracle import stem as _stem  # PSL-aware shared stem

            ok = _stem(h) == _stem(seed_host)
        if not ok:
            return False
        if any(re.search(p, url) for p in self.cfg.blacklist):
            return False
        if self.cfg.respect_robots_txt and self.policy.rules:
            if not self.policy.allowed([h], [_path_of_one(url)])[0]:
                return False
        return True

    def _seed_frontier(self) -> pa.Table:
        import ray

        seed = _norm_one(self.cfg.url)
        if seed is None:
            return schemas.FRONTIER.empty_table()
        seed_host = _host_of_one(seed)
        self.seed_host = seed_host
        self._ensure_scope_robots(seed_host)
        urls = []
        if self._admissible_seed(seed, seed_host):
            urls.append(seed)
        if self.cfg.sitemap:
            sm = f"https://{seed_host}/sitemap.xml"
            if sm not in urls and self._admissible_seed(sm, seed_host):
                urls.append(sm)
        if not urls:
            return schemas.FRONTIER.empty_table()
        shard = route_hash(urls) % self.cfg.n_seen_shards
        keep = []
        for s in sorted(set(shard.tolist())):
            pos = [i for i, sh in enumerate(shard) if sh == s]
            mask = ray.get(
                self.seen[int(s)].check_and_add.remote([urls[i] for i in pos])
            )
            keep.extend(urls[i] for i, m in zip(pos, mask) if m)
        urls = [u for u in urls if u in set(keep)]
        n = len(urls)
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array([_host_of_one(u) for u in urls], pa.string()),
                pa.array([0] * n, pa.int32()),
                pa.array([0.0] * n, pa.float64()),
                pa.array([""] * n, pa.string()),
                pa.array([self.cfg.crawl_id] * n, pa.string()),
                pa.array([0] * n, pa.int32()),
            ],
            schema=schemas.FRONTIER,
        )

    # ------------------------------------------------------------------ #
    def _to_table(self, frontier) -> pa.Table:
        import ray

        if isinstance(frontier, pa.Table):
            return frontier
        parts = [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in ray.get(frontier.to_arrow_refs())
        ]
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return schemas.FRONTIER.empty_table()
        return pa.concat_tables(parts).cast(schemas.FRONTIER).combine_chunks()

    def _nblocks(self, rows: int) -> int:
        """Fetch-stage block count. Fewer, bigger blocks win here: every fetch
        task blocks on `n_corpus_shards` actor round-trips, so task count ≫
        actor count just thrashes the scheduler (measured 10× slowdown at
        32 blocks vs 8 for 100k rows). Target ≥32k rows per block, bounded by
        [n_corpus_shards, num_cpus]."""
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
        if rows <= 0:
            return 1
        want = max(self.cfg.n_corpus_shards, -(-rows // 32768))
        return max(1, min(cpus, want))

    # ------------------------------------------------------------------ #
    # small-round coordinator path — same kernels, driver-side control
    def _politeness_wait(self, t_round0: float, host_counts: dict) -> None:
        """Wallclock politeness (T3 opt-in, ``cfg.wallclock_politeness``):
        pad the round to the slowest host's n_selected × effective_delay
        window — the reference's sleep-between-requests behavior
        (proto/crawler.proto:26) aggregated per round. The host-count dict
        is driver-side but the mode is inherently rate-limited (a crawl
        sleeping real politeness delays fetches a bounded number of hosts
        per window), so it never grows past the round's selected hosts."""
        from .state.robots import required_round_ms

        req = required_round_ms(
            host_counts, self.policy, self.cfg.delay_ms, self.cfg.respect_robots_txt
        )
        wait = req / 1000.0 - (time.time() - t_round0)
        if wait > 0:
            time.sleep(wait)
            self._lineage("politeness_wait", 0, 0, wait * 1000)

    @staticmethod
    def _host_counts_table(sel: pa.Table) -> dict:
        h, c = np.unique(
            sel.column("host").to_numpy(zero_copy_only=False), return_counts=True
        )
        return dict(zip(h.tolist(), c.tolist()))

    @staticmethod
    def _host_counts_dataset(selected) -> dict:
        def cnt(t: pa.Table) -> pa.Table:
            h, c = np.unique(
                t.column("host").to_numpy(zero_copy_only=False), return_counts=True
            )
            return pa.table(
                {
                    "host": pa.array(h.astype(object), pa.string()),
                    "n": pa.array(c.astype(np.int64)),
                }
            )

        out: dict = {}
        rows = (
            selected.select_columns(["host"])
            .map_batches(cnt, batch_format="pyarrow")
            .take_all()
        )
        for row in rows:
            out[row["host"]] = out.get(row["host"], 0) + int(row["n"])
        return out

    def _round_small(self, tab: pa.Table, out_dir: str):
        cfg, r = self.cfg, self.round
        t_round0 = time.time()
        t0 = time.time()
        sel, deferred = select_small(tab, cfg, self.policy)
        # global budget (O3)
        if cfg.max_pages >= 0:
            remaining = cfg.max_pages - self.pages_fetched
            if remaining <= 0:
                return None, tab, True
            if sel.num_rows > remaining:
                url = sel.column("url").to_numpy(zero_copy_only=False)
                depth = sel.column("depth").to_numpy(zero_copy_only=False)
                order = np.lexsort((url, depth))
                head = sel.take(pa.array(np.sort(order[:remaining])))
                rest = sel.take(pa.array(np.sort(order[remaining:])))
                deferred = rest if deferred is None else pa.concat_tables([deferred, rest])
                sel = head
        self._lineage("select", tab.num_rows, sel.num_rows, (time.time() - t0) * 1000)

        t0 = time.time()
        fetch_fn = make_fetch_fn(self.corpus, cfg.n_corpus_shards, cfg.crawl_id, r, self.agent)
        fetched = fetch_fn(sel)
        self.pages_fetched += fetched.num_rows
        self._lineage("fetch", sel.num_rows, fetched.num_rows, (time.time() - t0) * 1000)

        if out_dir and fetched.num_rows:
            t0 = time.time()
            rdir = os.path.join(out_dir, "fetched", f"round={r}")
            os.makedirs(rdir, exist_ok=True)
            out_tab = fetched
            if cfg.post_fetch_stages:  # §2.10 sink-path extension stages
                from .stages.registry import apply_stages_table

                out_tab = apply_stages_table(fetched, cfg.post_fetch_stages)
            pq.write_table(out_tab, os.path.join(rdir, "part-driver.parquet"))
            self._lineage(
                "results", fetched.num_rows, out_tab.num_rows, (time.time() - t0) * 1000, rdir
            )

        t0 = time.time()
        links = extract_links(fetched)
        cand = make_candidate_filter(cfg, self.seed_host, self.policy)(links)
        packed = combine_candidates_batch(cand)  # single batch ⇒ exact global min
        # fused claim+harvest: one actor call per TOUCHED shard (VERDICT r4
        # #5) — replaces the claim wave + all-shard harvest wave
        from .stages.dedup import claim_harvest_small

        parts = claim_harvest_small(
            self.seen, cfg.n_seen_shards, packed, cfg.crawl_id, r + 1
        )
        novel = (
            pa.concat_tables(parts) if parts else schemas.FRONTIER.empty_table()
        )
        self._lineage("discover", fetched.num_rows, novel.num_rows, (time.time() - t0) * 1000)

        nxt = novel if deferred is None else pa.concat_tables([deferred, novel])
        if cfg.wallclock_politeness:
            self._politeness_wait(t_round0, self._host_counts_table(sel))
        return fetched, nxt, False

    # ------------------------------------------------------------------ #
    # distributed round — the Ray Data pipeline (the at-scale path)
    def _round_distributed(self, frontier, out_dir: str):
        import ray.data as rd

        cfg, r = self.cfg, self.round
        t_round0 = time.time()
        n_front = frontier.count()
        t0 = time.time()
        selected, deferred = select_frontier(frontier, cfg, self.policy)
        selected = selected.materialize()
        n_sel = selected.count()

        budget_stop = False
        if cfg.max_pages >= 0:
            remaining = cfg.max_pages - self.pages_fetched
            if remaining <= 0:
                return None, frontier, True
            if n_sel > remaining:
                # split at the budget boundary VALUE, not by membership list:
                # frontier urls are unique, so (depth, url) strictly orders
                # rows and an O(1) boundary broadcast replaces shipping every
                # kept url to every task (scale: budget can be millions)
                ordered = selected.sort(["depth", "url"]).materialize()
                head = ordered.limit(remaining).materialize()
                block_max = head.map_batches(
                    lambda t: pa.table(
                        {
                            "depth": [t["depth"][int(np.lexsort((
                                t["url"].to_numpy(zero_copy_only=False),
                                t["depth"].to_numpy(zero_copy_only=False),
                            ))[-1])].as_py()],
                            "url": [t["url"][int(np.lexsort((
                                t["url"].to_numpy(zero_copy_only=False),
                                t["depth"].to_numpy(zero_copy_only=False),
                            ))[-1])].as_py()],
                        }
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                ).take_all()
                bd, bu = max((r["depth"], r["url"]) for r in block_max)
                rest = ordered.map_batches(
                    lambda t: t.filter(
                        pc.or_(
                            pc.greater(t["depth"], pa.scalar(bd, pa.int32())),
                            pc.and_(
                                pc.equal(t["depth"], pa.scalar(bd, pa.int32())),
                                pc.greater(t["url"], pa.scalar(bu)),
                            ),
                        )
                    ),
                    batch_format="pyarrow",
                )
                deferred = rest if deferred is None else deferred.union(rest)
                deferred = deferred.materialize()
                selected, n_sel = head, remaining
        self._lineage("select", n_front, n_sel, (time.time() - t0) * 1000)

        t0 = time.time()
        fetched = (
            selected.repartition(self._nblocks(n_sel))
            .map_batches(
                make_fetch_fn(
                    self.corpus,
                    cfg.n_corpus_shards,
                    cfg.crawl_id,
                    r,
                    self.agent,
                    # mid-round cooperative shutdown (distributed rounds can
                    # be long; reference aborts at any time, client.rs:88-99)
                    cfg.stop_flag_path,
                ),
                batch_format="pyarrow",
                batch_size=None,  # one call per block; shard routing inside
                zero_copy_batch=True,
            )
            .materialize()
        )
        n_pages = fetched.count()
        self.pages_fetched += n_pages
        self._lineage("fetch", n_sel, n_pages, (time.time() - t0) * 1000)
        # per-PARTITION lineage (north rule: every partition emits records):
        # one cheap pass over the materialized blocks; rows ≤ block count
        part_stats = fetched.map_batches(
            lambda t: pa.table(
                {"rows": pa.array([len(t)], pa.int64()), "bytes": pa.array([t.nbytes], pa.int64())}
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).take_all()
        for i, pr in enumerate(part_stats):
            self._lineage(f"fetch/partition={i}", int(pr["rows"]), int(pr["rows"]), 0, uri=f"bytes={int(pr['bytes'])}")

        if out_dir and n_pages:
            t0 = time.time()
            rdir = os.path.join(out_dir, "fetched", f"round={r}")
            out_ds = fetched
            if cfg.post_fetch_stages:  # §2.10 sink-path extension stages
                from .stages.registry import apply_stages_dataset

                out_ds = apply_stages_dataset(fetched, cfg.post_fetch_stages)
            out_ds.write_parquet(rdir)
            self._lineage("results", n_pages, n_pages, (time.time() - t0) * 1000, rdir)

        t0 = time.time()
        links = fetched.map_batches(
            extract_links, batch_format="pyarrow", zero_copy_batch=True
        )
        cand = links.map_batches(
            make_candidate_filter(cfg, self.seed_host, self.policy),
            batch_format="pyarrow",
        )
        packed = cand.map_batches(combine_candidates_batch, batch_format="pyarrow")
        claims = packed.map_batches(
            make_claim_fn(self.seen, cfg.n_seen_shards), batch_format="pyarrow"
        )
        # barrier: every claim registered before harvest; the claim rows
        # carry the touched shard ids, so untouched shards (empty pending by
        # construction) are never harvested (VERDICT r4 #5)
        touched = sorted({int(row["shard"]) for row in claims.take_all()})
        novel = rd.from_arrow_refs(
            [self.seen[s].harvest.remote(cfg.crawl_id, r + 1) for s in touched]
        ).materialize() if touched else rd.from_arrow(schemas.FRONTIER.empty_table())
        n_novel = novel.count()
        self._lineage("discover", n_pages, n_novel, (time.time() - t0) * 1000)

        nxt = (novel if deferred is None else deferred.union(novel)).materialize()
        if cfg.wallclock_politeness:
            self._politeness_wait(t_round0, self._host_counts_dataset(selected))
        return fetched, nxt, budget_stop

    # ------------------------------------------------------------------ #
    def run(
        self,
        mode: str = "crawl",
        out_dir: str = "",
        per_round_callback=None,
        max_rounds: int = 100_000,
    ) -> CrawlResult:
        import ray.data as rd

        cfg = self.cfg
        if self._resumed_frontier is not None:
            frontier = self._resumed_frontier
            self._resumed_frontier = None
        else:
            frontier = self._seed_frontier()
        stopped = False

        while _nrows(frontier) > 0 and self.round < max_rounds:
            if cfg.stop_flag_path and os.path.exists(cfg.stop_flag_path):
                stopped = True  # T6 cooperative shutdown between rounds
                break
            n_front = _nrows(frontier)
            if n_front <= cfg.small_round_threshold:
                tab = self._to_table(frontier)
                fetched, frontier, stopped = self._round_small(tab, out_dir)
            else:
                if isinstance(frontier, pa.Table):
                    frontier = rd.from_arrow(frontier).materialize()
                fetched, frontier, stopped = self._round_distributed(frontier, out_dir)
            if stopped:
                break
            if per_round_callback is not None:
                if per_round_callback(self.round, fetched) is False:
                    stopped = True  # sink-driven shutdown (client.rs:88-99)
            self.round += 1
            if cfg.checkpoint_dir and ((self.round - 1) % max(1, cfg.checkpoint_every) == 0):
                self._checkpoint(frontier)
            if stopped:
                break

        if cfg.checkpoint_dir:
            self._checkpoint(frontier)
        return self._result(mode, out_dir, stopped)

    # ------------------------------------------------------------------ #
    def iter_rounds(self, out_dir: str = "", max_rounds: int = 100_000):
        """Streaming-results surface of scan mode (reference ScanStream:
        per-page results flow out as found, src/rpc/client.rs:65-103): yields
        ``(round, fetched)`` as each wave completes — ``fetched`` is an Arrow
        table (coordinator rounds) or Dataset (distributed rounds). Closing
        the generator stops the crawl after the completed round ("shutdown"
        control parity); checkpoints behave as in :meth:`run`, including a
        final checkpoint when the consumer stops early. Call
        :meth:`_result` (or just read the seen shards) afterwards if the
        final link list is needed."""
        import ray.data as rd

        cfg = self.cfg
        # exposed so streaming consumers (rpc scan jobs) can report a
        # truncated crawl the same way run() does via CrawlResult.stopped
        self.stopped_early = False
        if self._resumed_frontier is not None:
            frontier = self._resumed_frontier
            self._resumed_frontier = None
        else:
            frontier = self._seed_frontier()
        try:
            while _nrows(frontier) > 0 and self.round < max_rounds:
                if cfg.stop_flag_path and os.path.exists(cfg.stop_flag_path):
                    self.stopped_early = True
                    break
                if _nrows(frontier) <= cfg.small_round_threshold:
                    fetched, frontier, stopped = self._round_small(
                        self._to_table(frontier), out_dir
                    )
                else:
                    if isinstance(frontier, pa.Table):
                        frontier = rd.from_arrow(frontier).materialize()
                    fetched, frontier, stopped = self._round_distributed(
                        frontier, out_dir
                    )
                if stopped:
                    self.stopped_early = True
                    break
                self.round += 1
                if cfg.checkpoint_dir and (
                    (self.round - 1) % max(1, cfg.checkpoint_every) == 0
                ):
                    self._checkpoint(frontier)
                yield self.round - 1, fetched
        finally:
            if cfg.checkpoint_dir:
                self._checkpoint(frontier)

    # ------------------------------------------------------------------ #
    def _result(self, mode: str, out_dir: str, stopped: bool) -> CrawlResult:
        import ray

        # per-shard refs only — the driver never concatenates the seen set
        # (VERDICT r1 #1: the old path pulled every visited URL to the driver)
        refs = [s.visited_table.remote() for s in self.seen]
        n_visited = sum(ray.get([s.size.remote() for s in self.seen]))
        lineage = (
            pa.Table.from_pylist(self.lineage_rows, schema=schemas.LINEAGE)
            if self.lineage_rows
            else schemas.LINEAGE.empty_table()
        )
        if out_dir and mode == "crawl":
            # whole-crawl result: one final link list (S7, full=true analogue),
            # written as a partitioned dataset straight from the shard refs
            import ray.data as rd

            crawl_id = self.cfg.crawl_id

            def to_results(t: pa.Table) -> pa.Table:
                n = t.num_rows
                return pa.Table.from_arrays(
                    [
                        pa.array([crawl_id] * n, pa.string()),
                        t.column("url"),
                        pa.array([True] * n, pa.bool_()),
                    ],
                    schema=schemas.RESULTS,
                )

            os.makedirs(out_dir, exist_ok=True)
            rd.from_arrow_refs(refs).map_batches(
                to_results, batch_format="pyarrow"
            ).write_parquet(os.path.join(out_dir, "results.parquet"))
        return CrawlResult(
            crawl_id=self.cfg.crawl_id,
            visited_refs=refs,
            n_visited=n_visited,
            pages_fetched=self.pages_fetched,
            rounds=self.round,
            stopped=stopped,
            lineage=lineage,
            out_dir=out_dir,
        )

    # ------------------------------------------------------------------ #
    # checkpoint / resume (§4 checkpoint row; manifest-rename = commit point)
    def _checkpoint(self, frontier):
        import ray

        cfg = self.cfg
        root = cfg.checkpoint_dir
        final = os.path.join(root, f"round={self.round}")
        if os.path.exists(final):
            return
        tmp = os.path.join(root, f".tmp-round={self.round}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.time()
        # 1. seen — every shard writes its own partition in parallel
        # (actor-side; the driver collects only the file paths)
        seen_dir = os.path.join(tmp, "seen")
        os.makedirs(seen_dir, exist_ok=True)
        seen_files = ray.get([s.write_snapshot.remote(seen_dir) for s in self.seen])
        # 2. frontier — distributed write when it's a Dataset, single file
        # when the coordinator path holds a small driver-side table
        frontier_dir = os.path.join(tmp, "frontier")
        if isinstance(frontier, pa.Table):
            os.makedirs(frontier_dir, exist_ok=True)
            pq.write_table(frontier, os.path.join(frontier_dir, "part-driver.parquet"))
        else:
            frontier.write_parquet(frontier_dir)
        # 3. host_state + lineage
        hosts = sorted(self.policy.rules)
        pq.write_table(
            pa.Table.from_arrays(
                [
                    pa.array(hosts, pa.string()),
                    pa.array(
                        [list(self.policy.rules[h].disallow) for h in hosts],
                        pa.list_(pa.string()),
                    ),
                    pa.array(
                        [self.policy.rules[h].crawl_delay_ms for h in hosts], pa.int64()
                    ),
                    pa.array(
                        [list(self.policy.rules[h].allow) for h in hosts],
                        pa.list_(pa.string()),
                    ),
                    pa.array([self.round] * len(hosts), pa.int32()),
                    pa.array([0] * len(hosts), pa.int64()),
                ],
                schema=schemas.HOST_STATE,
            ),
            os.path.join(tmp, "host_state.parquet"),
        )
        pq.write_table(
            pa.Table.from_pylist(self.lineage_rows, schema=schemas.LINEAGE),
            os.path.join(tmp, "lineage.parquet"),
        )
        # 4. manifest inside tmp, then atomic dir rename = commit
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            json.dump(
                {
                    "round": self.round,
                    "pages_fetched": self.pages_fetched,
                    "crawl_id": cfg.crawl_id,
                    "seed": cfg.url,
                    "n_seen_shards": cfg.n_seen_shards,
                    "seen_files": sorted(os.path.basename(p) for p in seen_files),
                },
                f,
            )
        os.replace(tmp, final)
        self._lineage("checkpoint", 0, 0, (time.time() - t0) * 1000, final)

    @classmethod
    def resume(
        cls,
        corpus_parquet: str,
        cfg: CrawlConfig,
        robots_table: pa.Table | None = None,
        out_dir: str = "",
    ) -> "CrawlEngine":
        """Rebuild an engine mid-frontier from the latest committed checkpoint.

        Results from rounds at/after the checkpointed round are discarded so
        no page is double-reported (SURVEY §7.4.3 exactly-once)."""
        import ray

        root = cfg.checkpoint_dir
        rounds = sorted(
            int(d.split("=")[1])
            for d in os.listdir(root)
            if d.startswith("round=")
            and os.path.exists(os.path.join(root, d, "MANIFEST.json"))
        )
        if not rounds:
            raise FileNotFoundError(f"no committed checkpoint under {root}")
        last = rounds[-1]
        ck = os.path.join(root, f"round={last}")
        with open(os.path.join(ck, "MANIFEST.json")) as f:
            manifest = json.load(f)

        eng = cls(corpus_parquet, cfg, robots_table)
        eng.round = manifest["round"]
        eng.pages_fetched = manifest["pages_fetched"]
        eng.seed_host = _host_of_one(_norm_one(cfg.url) or "")
        if manifest.get("n_seen_shards", cfg.n_seen_shards) != cfg.n_seen_shards:
            raise ValueError(
                "n_seen_shards changed between checkpoint and resume config"
            )
        # each shard reads its own partition (actor-side, parallel)
        seen_dir = os.path.join(ck, "seen")
        restores = []
        for fname in os.listdir(seen_dir):
            sh = int(fname.split("=")[1].split(".")[0])
            restores.append(
                eng.seen[sh].restore_from_parquet.remote(os.path.join(seen_dir, fname))
            )
        ray.get(restores)
        hs = pq.read_table(os.path.join(ck, "host_state.parquet"))
        for row in hs.to_pylist():
            eng.policy.update(
                row["host"],
                (
                    tuple(row["robots_disallow"] or ()),
                    int(row["crawl_delay_ms"]),
                    tuple(row.get("robots_allow") or ()),
                ),
            )
        eng._robots_loaded = True  # learned rules came from the checkpoint
        fdir = os.path.join(ck, "frontier")
        parts = [f for f in os.listdir(fdir) if f.endswith(".parquet")]
        eng._resumed_frontier = (
            pq.read_table(fdir).select(schemas.FRONTIER.names).cast(schemas.FRONTIER).combine_chunks()
            if parts
            else schemas.FRONTIER.empty_table()
        )
        eng.lineage_rows = pq.read_table(os.path.join(ck, "lineage.parquet")).to_pylist()
        if out_dir:
            fdir = os.path.join(out_dir, "fetched")
            if os.path.isdir(fdir):
                for d in os.listdir(fdir):
                    if d.startswith("round=") and int(d.split("=")[1]) >= eng.round:
                        shutil.rmtree(os.path.join(fdir, d), ignore_errors=True)
        return eng


    # ------------------------------------------------------------------ #
    def run_wave(self, urls: list[str] | pa.Table, out_dir: str = ""):
        """Process ONE frontier wave over a given URL list / frontier table /
        frontier Dataset (batch-scan of known pages — the distributed inner
        job of the crawl; also the scaling-bench workload): politeness select
        → fetch join → extract → candidate unique → seen anti-join.
        Returns (fetched_rows, novel_rows, fetched_dataset)."""
        import ray.data as rd

        from . import urlnorm

        if not isinstance(urls, (pa.Table, list)):
            ds = urls.materialize()  # already a frontier Dataset
            if not self.seed_host:
                self.seed_host = _host_of_one(_norm_one(self.cfg.url) or "")
            self._ensure_scope_robots(self.seed_host)
            fetched, nxt, _ = self._round_distributed(ds, out_dir)
            self.round += 1
            return (
                fetched.count() if fetched is not None else 0,
                _nrows(nxt),
                fetched,
            )
        if isinstance(urls, pa.Table):
            tab = urls
        else:
            n = len(urls)
            arr = pa.array(urls, pa.string())
            hosts = urlnorm.host_of(arr)
            tab = pa.Table.from_arrays(
                [
                    arr,
                    hosts,
                    pa.array([0] * n, pa.int32()),
                    pa.array([0.0] * n, pa.float64()),
                    pa.array([""] * n, pa.string()),
                    pa.array([self.cfg.crawl_id] * n, pa.string()),
                    pa.array([0] * n, pa.int32()),
                ],
                schema=schemas.FRONTIER,
            )
        if not self.seed_host:
            self.seed_host = _host_of_one(_norm_one(self.cfg.url) or "") or (
                tab.column("host")[0].as_py() if tab.num_rows else ""
            )
        self._ensure_scope_robots(self.seed_host)
        ds = rd.from_arrow(tab).materialize()
        fetched, nxt, _ = self._round_distributed(ds, out_dir)
        self.round += 1
        return (
            fetched.count() if fetched is not None else 0,
            _nrows(nxt),
            fetched,
        )


# ---------------------------------------------------------------------- #
# reference-parity entry points (SURVEY S1/S2)

def run_crawl(
    corpus_parquet: str,
    cfg: CrawlConfig,
    robots_table: pa.Table | None = None,
    out_dir: str = "",
) -> CrawlResult:
    """Batch mode — reference `Crawl` endpoint (server.rs:54-88): crawl to
    completion, deliver the full link list once."""
    eng = CrawlEngine(corpus_parquet, cfg, robots_table)
    try:
        return eng.run(mode="crawl", out_dir=out_dir)
    finally:
        eng.close()


def run_jobs(
    corpus_parquet: str,
    jobs: list[CrawlConfig],
    robots_table: pa.Table | None = None,
    out_root: str = "",
    parallel: bool = False,
) -> list[CrawlResult]:
    """Multiple crawl jobs (reference: one detached tokio task per gRPC
    request, src/rpc/server.rs:35,71). ``parallel=True`` runs one driver
    thread per job — each job's state is fully isolated in its own actor set
    (the reference's isolated-context design, README.md:119), and the round
    loops block in ``ray.get`` so threads interleave on the shared cluster.
    Results come back in job order either way."""

    def one(cfg: CrawlConfig) -> CrawlResult:
        out = os.path.join(out_root, f"crawl={cfg.crawl_id}") if out_root else ""
        return run_crawl(corpus_parquet, cfg, robots_table, out_dir=out)

    if not parallel:
        return [one(cfg) for cfg in jobs]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(jobs), 8)) as pool:
        return list(pool.map(one, jobs))


def run_scan(
    corpus_parquet: str,
    cfg: CrawlConfig,
    robots_table: pa.Table | None = None,
    out_dir: str = "",
    per_round_callback=None,
) -> CrawlResult:
    """Streaming mode — reference `Scan` endpoint (server.rs:18-52): per-round
    results delivered as found; callback may return False to shut down."""
    eng = CrawlEngine(corpus_parquet, cfg, robots_table)
    try:
        return eng.run(
            mode="scan", out_dir=out_dir, per_round_callback=per_round_callback
        )
    finally:
        eng.close()
