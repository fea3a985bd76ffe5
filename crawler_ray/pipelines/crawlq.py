"""Crawl-engine query wrappers for ``__ray_entry__.queries()``: each derives a
deterministic synthetic corpus sized to the sf of the given directory (the
driver tables have no spans column — FIXTURES.md §5), runs the Ray pipeline,
and (where SQL-expressible) exposes a DuckDB oracle over the SAME cached
corpus parquet under /tmp.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

from ..config import CrawlConfig
from ..functions.extract import extract_links, span_kind_counts
from ..synth import CorpusSpec, corpus_path, robots_path

# corpus spec per sf tier — deterministic, cached by spec hash
_SPECS = {
    "sf0.001": CorpusSpec(n_hosts=4, pages_per_host=20),
    "sf0.01": CorpusSpec(n_hosts=8, pages_per_host=50),
    "sf0.1": CorpusSpec(n_hosts=16, pages_per_host=150, hot_host_factor=5),
}


def spec_for_sf(sf_dir: str) -> CorpusSpec:
    name = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf[\d.]+", name)
    return _SPECS.get(m.group(0) if m else "sf0.01", _SPECS["sf0.01"])


def corpus_for_sf(sf_dir: str) -> str:
    """Parquet path of the (cached) corpus for this sf tier."""
    return corpus_path(spec_for_sf(sf_dir))


def corpus_links(sf_dir: str):
    """Link extraction over the interleaved corpus (M2) — the §7.1 minimum
    slice, SQL-checkable via UNNEST."""
    import ray.data as rd

    path = corpus_for_sf(sf_dir)
    corpus = rd.read_parquet(path)

    def as_fetched(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.Table.from_arrays(
            [
                t["doc_id"].combine_chunks(),
                pa.array([0] * n, pa.int32()),
                pa.array(["q"] * n, pa.string()),
                t["spans"].combine_chunks(),
            ],
            names=["url", "depth", "crawl_id", "spans"],
        )

    links = corpus.map_batches(as_fetched, batch_format="pyarrow").map_batches(
        extract_links, batch_format="pyarrow", zero_copy_batch=True
    )
    return links.select_columns(["src", "dst", "dst_host"])


def corpus_links_sql(sf_dir: str) -> str:
    path = corpus_for_sf(sf_dir)
    return f"""
    SELECT t.doc_id AS src,
           u.s['text'] AS dst,
           REGEXP_EXTRACT(u.s['text'], '^[a-z]+://([^/]+)', 1) AS dst_host
    FROM read_parquet('{path}') t, UNNEST(t.spans) AS u(s)
    WHERE u.s['kind'] = 'link'
    """


def span_profile(sf_dir: str):
    """Per-document span-kind counts (vectorized explode + bincount)."""
    import ray.data as rd

    return rd.read_parquet(corpus_for_sf(sf_dir)).map_batches(
        span_kind_counts, batch_format="pyarrow", zero_copy_batch=True
    )


def span_profile_sql(sf_dir: str) -> str:
    path = corpus_for_sf(sf_dir)
    return f"""
    SELECT t.doc_id,
           COUNT(*) FILTER (WHERE u.s['kind'] = 'text')  AS n_text,
           COUNT(*) FILTER (WHERE u.s['kind'] = 'link')  AS n_link,
           COUNT(*) FILTER (WHERE u.s['kind'] = 'media') AS n_media
    FROM read_parquet('{path}') t, UNNEST(t.spans) AS u(s)
    GROUP BY t.doc_id
    """


def crawl_bfs(sf_dir: str):
    """Full crawl of host 0 on the sf-tier corpus: returns the visited set
    with BFS depth per URL (waves). Oracle: :func:`crawl_bfs_sql` (recursive
    CTE over the UNNEST'd link spans); pytest additionally pins it to the
    plain-Python oracle crawler."""
    import pyarrow.parquet as pq

    from ..engine import CrawlEngine

    spec = spec_for_sf(sf_dir)
    cfg = CrawlConfig(url=f"https://{spec.host(0)}/", sitemap=True)
    eng = CrawlEngine(corpus_path(spec), cfg, pq.read_table(robots_path(spec)))
    try:
        out = "/tmp/crawler_ray_q/bfs_" + os.path.basename(os.path.normpath(sf_dir))
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        eng.run(mode="crawl", out_dir=out)
        import glob

        files = glob.glob(out + "/fetched/**/*.parquet", recursive=True)
        tab = pa.concat_tables(
            [pq.read_table(f, columns=["url", "depth"]) for f in files]
        ).combine_chunks()
        return tab.sort_by("url")
    finally:
        eng.close()


def crawl_bfs_sql(sf_dir: str) -> str:
    """DuckDB oracle for :func:`crawl_bfs` — BFS over the corpus link graph
    as a recursive CTE. Valid because the synthetic corpus stores links as
    already-normalized absolute URLs, the seed host's robots are permissive
    and carry no crawl delay (synth._robots_rules host 0), and with no
    politeness deferral the engine's per-URL depth equals the shortest-path
    depth. Fetched rows include admissible dangling URLs (status 404 — the
    engine fetches them once, oracle.py:156-158), which the CTE reaches as
    link targets with no outgoing edges. UNION dedups (url, depth) states and
    the depth bound caps cycle expansion, so the recursion terminates."""
    spec = spec_for_sf(sf_dir)
    path = corpus_path(spec)
    host = spec.host(0)
    return f"""
    WITH RECURSIVE links AS (
        SELECT t.doc_id AS src, u.s['text'] AS dst
        FROM read_parquet('{path}') t, UNNEST(t.spans) AS u(s)
        WHERE u.s['kind'] = 'link'
          AND u.s['text'] LIKE 'https://{host}/%'
    ),
    bfs(url, depth) AS (
        SELECT url, 0 AS depth
        FROM (VALUES ('https://{host}/'), ('https://{host}/sitemap.xml')) AS seeds(url)
        UNION
        SELECT l.dst, b.depth + 1
        FROM bfs b JOIN links l ON l.src = b.url
        WHERE b.depth < 100
    )
    SELECT url, CAST(MIN(depth) AS INTEGER) AS depth
    FROM bfs
    GROUP BY url
    """


# --------------------------------------------------------------------------- #
def pagerank(
    sf_dir: str,
    n_iters: int = 5,
    scale: int = 10**12,
    distributed: bool | None = None,
    mem_cutoff: int = 2_000_000,
):
    """Fixed-point integer PageRank over the corpus link graph — the graph-
    analytics member of the training-data family (link-authority weighting
    for crawl prioritization / quality signals).

    All arithmetic is INTEGER (rank in ``scale`` micro-units, floor
    division, damping 85/100), which makes the result BIT-IDENTICAL between
    the distributed engine and the SQL oracle — the textbook double
    formulation accumulates engine-specific summation-order error across
    iterations and can never hash-match. Dangling mass is dropped (both
    sides), teleport term is ``(15 * (scale // n)) // 100``.

    Scale shape: one hash shuffle makes edges distinct; each iteration is a
    contrib projection → one edges⋈contrib hash join → grouped sum → one
    nodes⋈sums left join; the (url, deg, rank) state materializes per
    iteration (bounded: one row per node) to keep lineage flat — the
    classic iterative-dataflow checkpoint. Below ``mem_cutoff`` distinct
    edges, the same integer recurrence runs as an in-memory numpy kernel
    (factorize → bincount degrees → np.add.at message sums) — identical
    results by construction since every operation is exact integer math;
    the dup_clusters precedent for small-side shortcuts with a pinned
    parity test."""
    import pyarrow.compute as pc

    from .partitions import for_bytes, for_rows, keyed_merge

    links = corpus_links(sf_dir).select_columns(["src", "dst"])
    # distinct-edge / degree / node-set / message-sum merges all have
    # data-scaling group counts (|E| or |V| groups) — keyed_merge keeps the
    # Python dispatch at the partition count; the sort aggregate's per-group
    # reduce would dominate at web-graph scale
    n_merge = for_bytes(os.path.getsize(corpus_for_sf(sf_dir)), 32 << 20, floor=8)
    edges = keyed_merge(
        links,
        ["src", "dst"],
        lambda df: df.drop_duplicates(["src", "dst"]),
        n_merge,
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # empty link graph: no nodes, so base = scale // n is undefined —
        # return the empty (url, rank) frame both paths would converge to
        import pandas as pd

        return pd.DataFrame(
            {"url": pd.Series([], dtype=object), "rank": pd.Series([], dtype="int64")}
        )
    if distributed is None:
        distributed = n_edges > mem_cutoff
    if not distributed:
        return _pagerank_numpy(edges.to_pandas(), n_iters, scale)
    deg = keyed_merge(
        edges,
        "src",
        lambda df: df.groupby("src", as_index=False).size().rename(
            columns={"size": "deg"}
        ),
        n_merge,
    )
    n_parts = for_rows(n_edges, 2_000_000, floor=1)

    def as_url(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"url": pc.unique(t[name].combine_chunks())})

        return fn

    nodes = keyed_merge(
        edges.map_batches(as_url("src"), batch_format="pyarrow").union(
            edges.map_batches(as_url("dst"), batch_format="pyarrow")
        ),
        "url",
        lambda df: df.drop_duplicates("url"),
        n_merge,
    ).materialize()  # consumed twice: count() below and the state join
    n = nodes.count()
    base = scale // n
    teleport = (15 * base) // 100

    def init_state(t: pa.Table) -> pa.Table:
        d = t["deg"].combine_chunks()
        return pa.table(
            {
                "url": t["url"].combine_chunks(),
                "deg": d.fill_null(0).cast(pa.int64()),
                "rank": pa.array([base] * len(t), pa.int64()),
            }
        )

    state = (
        nodes.join(deg, join_type="left_outer", num_partitions=n_parts,
                   on=("url",), right_on=("src",))
        .map_batches(init_state, batch_format="pyarrow")
        .materialize()
    )

    def contrib(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["deg"], pa.scalar(0)))
        c = pc.divide(t["rank"].combine_chunks(), t["deg"].combine_chunks())
        return pa.table({"src": t["url"].combine_chunks(), "c": c})

    for _ in range(n_iters):
        msgs = edges.join(
            state.map_batches(contrib, batch_format="pyarrow"),
            join_type="inner", num_partitions=n_parts, on=("src",), right_on=("src",),
        )
        sums = keyed_merge(
            msgs,
            "dst",
            lambda df: df.groupby("dst", as_index=False)["c"].sum(),
            n_merge,
        )

        def apply(t: pa.Table) -> pa.Table:
            # empty blocks can lose join-added columns through the hash
            # shuffle (same guard as customers_without_big_orders): a block
            # with no matched sums means contribution 0 for every row
            if "c" in t.column_names:
                s = t["c"].combine_chunks().fill_null(0)
            else:
                s = pa.array([0] * len(t), pa.int64())
            new = pc.add(
                pa.scalar(teleport, pa.int64()),
                pc.divide(pc.multiply(s, pa.scalar(85, pa.int64())), pa.scalar(100, pa.int64())),
            )
            return pa.table(
                {
                    "url": t["url"].combine_chunks(),
                    "deg": t["deg"].combine_chunks(),
                    "rank": new,
                }
            )

        state = (
            state.join(sums, join_type="left_outer", num_partitions=n_parts,
                       on=("url",), right_on=("dst",))
            .map_batches(apply, batch_format="pyarrow")
            .materialize()
        )

    return state.select_columns(["url", "rank"])


def _pagerank_numpy(edges, n_iters: int, scale: int):
    """In-memory exact-integer PageRank kernel (small-graph path): identical
    results to the Dataset path — every operation is int64 floor math."""
    import numpy as np
    import pandas as pd

    if len(edges) == 0:
        return pd.DataFrame(
            {"url": pd.Series([], dtype=object), "rank": pd.Series([], dtype="int64")}
        )
    codes, urls = pd.factorize(
        pd.concat([edges["src"], edges["dst"]], ignore_index=True), sort=False
    )
    m = len(edges)
    src_i, dst_i = codes[:m], codes[m:]
    n = len(urls)
    deg = np.bincount(src_i, minlength=n).astype(np.int64)
    base = scale // n
    teleport = (15 * base) // 100
    rank = np.full(n, base, dtype=np.int64)
    for _ in range(n_iters):
        contrib = np.zeros(n, dtype=np.int64)
        has = deg > 0
        contrib[has] = rank[has] // deg[has]
        sums = np.zeros(n, dtype=np.int64)
        np.add.at(sums, dst_i, contrib[src_i])
        rank = teleport + (85 * sums) // 100
    return pd.DataFrame({"url": urls, "rank": rank})


def pagerank_sql(sf_dir: str, n_iters: int = 5, scale: int = 10**12) -> str:
    """Oracle for :func:`pagerank`: the same integer fixed-point recurrence,
    unrolled as one CTE per iteration (SUM promotes to HUGEINT; every
    intermediate stays exact, final rank cast back to BIGINT)."""
    path = corpus_for_sf(sf_dir)
    ctes = [
        f"""e AS (
        SELECT DISTINCT t.doc_id AS src, u.s['text'] AS dst
        FROM read_parquet('{path}') t, UNNEST(t.spans) AS u(s)
        WHERE u.s['kind'] = 'link'
    )""",
        "v AS (SELECT src AS url FROM e UNION SELECT dst FROM e)",
        "d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        f"nn AS (SELECT COUNT(*) AS n FROM v)",
        f"r0 AS (SELECT url, (SELECT {scale} // n FROM nn) AS rank FROM v)",
    ]
    for i in range(n_iters):
        ctes.append(f"""r{i + 1} AS (
        SELECT v.url,
               (15 * (SELECT {scale} // n FROM nn)) // 100
               + (85 * COALESCE(s.s, 0)) // 100 AS rank
        FROM v LEFT JOIN (
            SELECT e.dst AS url, SUM(r{i}.rank // d.deg) AS s
            FROM e JOIN r{i} ON r{i}.url = e.src JOIN d ON d.src = e.src
            GROUP BY e.dst
        ) s ON s.url = v.url
    )""")
    return f"""
    WITH {", ".join(ctes)}
    SELECT url, CAST(rank AS BIGINT) AS rank FROM r{n_iters}
    """


# --- approximate-distinct cardinality (HyperLogLog) --------------------------

_HLL_P = 12  # 2^12 = 4096 registers
_HLL_RANK_BITS = 64 - _HLL_P


def hll_bucket_rank(strs):
    """md5-based HLL (bucket, rank) arrays for a sequence of distinct strings
    — the shared sketch kernel (bucket = top 12 hash bits, rank = 1-based
    first-1-bit position in the low 52; all-zero remainder → 53)."""
    import hashlib

    import numpy as np

    h = np.fromiter(
        (int(hashlib.md5(s.encode()).hexdigest()[:16], 16) for s in strs),
        dtype=np.uint64,
        count=len(strs),
    )
    bucket = (h >> np.uint64(_HLL_RANK_BITS)).astype(np.int64)
    rem = h & np.uint64((1 << _HLL_RANK_BITS) - 1)
    # exact integer bit_length via frexp (rem < 2^52 → exact in float64)
    e = np.frexp(rem.astype(np.float64))[1]
    rank = np.where(rem == 0, _HLL_RANK_BITS + 1, _HLL_RANK_BITS + 1 - e)
    return bucket, rank.astype(np.int64)


def hll_distinct(sf_dir: str):
    """Approximate-distinct cardinality sketch (HyperLogLog registers) over
    the link-target URL set — the frontier-size estimation primitive ("how
    many distinct URLs has the crawl discovered") without a global distinct
    shuffle (SURVEY §2.5 A4's counting sibling; reference analogue: the
    frontier dedup set, /root/reference/README.md budget/depth table).

    Returns the (bucket, max_rank) register table (≤4096 rows). Registers
    are MERGEABLE (elementwise max), so at 100 TB each block emits partial
    registers — ≤4096 tiny rows per block, deduped within the batch — and a
    single bounded ``groupby(bucket).max()`` merges them; no distinct-URL
    shuffle, no global set, state size is O(4 KB) regardless of input size.
    :func:`hll_estimate` turns registers into the cardinality estimate
    (pytest pins it within ±5% of the exact count at sf0.01).

    Hash parity with the DuckDB oracle: ``md5(url)`` first 16 hex chars →
    uint64; bucket = top 12 bits; rank = 1-based position of the first 1-bit
    in the low 52 (all-zero remainder → 53).
    """
    import numpy as np
    import pandas as pd

    links = corpus_links(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df["dst"].dropna().unique()
        if not len(vals):
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int64"),
                    "max_rank": pd.Series([], dtype="int64"),
                }
            )
        bucket, rank = hll_bucket_rank(vals)
        out = pd.DataFrame({"bucket": bucket, "max_rank": rank})
        return out.groupby("bucket", as_index=False)["max_rank"].max()

    partials = links.map_batches(partial, batch_format="pandas")

    # merge partials with the pkey+kernel pattern, NOT Ray's sort aggregate
    # — 4096 bucket groups under the sort aggregate pay per-group Python
    # dispatch (~4 s measured); 8 coarse pkey partitions with a vectorized
    # in-partition groupby-max merge the same registers in milliseconds.
    n_parts = 8

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["pkey"] = (df["bucket"].to_numpy() % n_parts).astype(np.int64)
        return df

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop(columns=["pkey"]).groupby("bucket", as_index=False)[
            "max_rank"
        ].max()

    return (
        partials.map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(merge, batch_format="pandas")
    )


def hll_estimate(regs, m: int = 1 << _HLL_P) -> float:
    """Standard HLL estimator with small-range linear-counting correction,
    over the register table :func:`hll_distinct` returns."""
    import numpy as np

    df = regs.to_pandas() if hasattr(regs, "to_pandas") else regs
    ranks = df["max_rank"].to_numpy()
    zeros = m - len(ranks)  # absent buckets hold rank 0
    harmonic = zeros * 1.0 + np.sum(np.exp2(-ranks.astype(np.float64)))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / harmonic
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_distinct_sql(sf_dir: str) -> str:
    """Oracle: the identical md5-based HLL registers recomputed in SQL over
    the UNNEST-extracted distinct link targets."""
    path = corpus_for_sf(sf_dir)
    rb = _HLL_RANK_BITS
    return f"""
    WITH u AS (
        SELECT DISTINCT u.s['text'] AS dst
        FROM read_parquet('{path}') t, UNNEST(t.spans) AS u(s)
        WHERE u.s['kind'] = 'link' AND u.s['text'] IS NOT NULL
    ),
    h AS (SELECT CAST('0x' || SUBSTR(md5(dst), 1, 16) AS UBIGINT) AS h FROM u),
    b AS (
        SELECT CAST(h >> {rb} AS BIGINT) AS bucket,
               h & ((1::UBIGINT << {rb}) - 1) AS rem
        FROM h
    )
    SELECT bucket,
           CAST(MAX(CASE WHEN rem = 0 THEN {rb + 1}
                         ELSE {rb + 1} - LENGTH(bin(rem)) END) AS BIGINT) AS max_rank
    FROM b GROUP BY bucket
    """


_HOST_RE = re.compile(r"^[a-z]+://([^/]+)")


def host_graph(sf_dir: str):
    """Host-level web graph — the classic page-graph → host-graph
    contraction (the granularity crawl schedulers, politeness budgets and
    spam analyses operate at): every extracted link becomes a
    (src_host, dst_host) edge with its link count and distinct-target
    count.

    Scale shape: link extraction streams (same vectorized span explode as
    `corpus_links`); the contraction is ONE coarse hash exchange on the
    host PAIR via `keyed_merge` — edge-group cardinality scales with the
    data (hosts²), exactly the shape Ray's per-group sort aggregate pays
    ~ms/group Python dispatch for, while here kernel invocations =
    partition count. DISTINCT dst needs the pair's raw rows co-located
    (distinct partials don't add), which the pair-hash partitioning
    guarantees; n_links alone could pre-combine per batch — kept raw so
    one exchange serves both aggregates."""
    import pandas as pd

    from .partitions import for_rows, keyed_merge

    links = corpus_links(sf_dir).select_columns(["src", "dst", "dst_host"])

    def add_src_host(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src_host": df["src"].str.extract(_HOST_RE, expand=False),
                "dst_host": df["dst_host"],
                "dst": df["dst"],
            }
        )

    def contract(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["src_host", "dst_host"], as_index=False).agg(
            n_links=("dst", "size"), n_unique_dst=("dst", "nunique")
        )
        g["n_links"] = g["n_links"].astype("int64")
        g["n_unique_dst"] = g["n_unique_dst"].astype("int64")
        return g

    with_src = links.map_batches(add_src_host, batch_format="pandas")
    n_rows = _corpus_meta_rows(sf_dir)
    return keyed_merge(
        with_src,
        ["src_host", "dst_host"],
        contract,
        for_rows(n_rows, 500_000, floor=4),
    )


def _corpus_meta_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(corpus_for_sf(sf_dir)).num_rows


def host_graph_sql(sf_dir: str) -> str:
    return f"""
    WITH links AS ({corpus_links_sql(sf_dir)})
    SELECT REGEXP_EXTRACT(src, '^[a-z]+://([^/]+)', 1) AS src_host,
           dst_host,
           CAST(COUNT(*) AS BIGINT) AS n_links,
           CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_unique_dst
    FROM links
    GROUP BY 1, 2
    """


def reciprocal_links(sf_dir: str):
    """Mutual (A↔B) page edges — the graph self-join behind nepotistic-link
    / link-farm spam detection (reciprocal-link density is a classic spam
    signal a crawl scheduler feeds its prioritizer).

    Scale shape: a naive self-join shuffles the edge set TWICE; instead
    each edge maps to its unordered pair (min, max, direction-bit) and a
    per-batch drop_duplicates bounds partials by distinct pairs per batch.
    ONE `keyed_merge` hash exchange on the pair co-locates both directions,
    and the kernel keeps pairs whose direction-bits span {fwd, bwd} — the
    self-join collapses into a grouped any/any. Self-loops drop at the
    map."""
    import numpy as np
    import pandas as pd

    from .partitions import for_rows, keyed_merge

    links = corpus_links(sf_dir).select_columns(["src", "dst"])

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src"] != df["dst"]]
        fwd = (df["src"] < df["dst"]).to_numpy()
        a = np.where(fwd, df["src"].to_numpy(), df["dst"].to_numpy())
        b = np.where(fwd, df["dst"].to_numpy(), df["src"].to_numpy())
        out = pd.DataFrame({"url_a": a, "url_b": b, "fwd": fwd})
        return out.drop_duplicates()

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["url_a", "url_b"], as_index=False)["fwd"].agg(["min", "max"])
        g = g[(~g["min"]) & g["max"]]
        return g[["url_a", "url_b"]].reset_index(drop=True)

    pairs = links.map_batches(to_pairs, batch_format="pandas")
    return keyed_merge(
        pairs, ["url_a", "url_b"], kernel, for_rows(_corpus_meta_rows(sf_dir), 500_000, floor=4)
    )


def reciprocal_links_sql(sf_dir: str) -> str:
    return f"""
    WITH links AS ({corpus_links_sql(sf_dir)}),
    l AS (SELECT DISTINCT src, dst FROM links WHERE src <> dst)
    SELECT l1.src AS url_a, l1.dst AS url_b
    FROM l l1 JOIN l l2 ON l1.src = l2.dst AND l1.dst = l2.src
    WHERE l1.src < l1.dst
    """


def link_triangles(sf_dir: str, distributed: bool | None = None,
                   mem_cutoff: int = 2_000_000):
    """Global triangle count over the undirected page graph — the
    clustering-coefficient numerator (link-spam and community-structure
    signal; triangle-dense neighborhoods are a classic link-farm tell).

    Scale shape — the standard degree-oriented algorithm, every stage a
    bounded exchange:
      1. distinct undirected edges via ONE unordered-pair keyed merge
         (per-batch dedup bounds partials);
      2. degrees via ONE node-keyed merge (per-batch partial counts);
      3. orientation rank = (degree, url): each edge points low→high rank,
         so every out-neighborhood is O(√m) and the wedge stage's
         per-vertex quadratic term is bounded — the property that makes
         triangle counting feasible on power-law web graphs;
      4. endpoint degrees attach through TWO hash-partitioned
         `Dataset.join`s (never a driver-side degree map — node count
         scales with the corpus);
      5. wedges (a→b, a→c) generate per source partition with vectorized
         repeat/tile over sorted neighbor arrays;
      6. ONE final pair-keyed merge co-locates wedge pairs with oriented
         edges and counts closures — triangles never materialize, only
         per-partition partial counts reach the driver."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from .partitions import for_rows, keyed_merge

    n_parts = for_rows(_corpus_meta_rows(sf_dir), 500_000, floor=4)
    links = corpus_links(sf_dir).select_columns(["src", "dst"])

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src"] != df["dst"]]
        fwd = (df["src"] < df["dst"]).to_numpy()
        a = np.where(fwd, df["src"].to_numpy(), df["dst"].to_numpy())
        b = np.where(fwd, df["dst"].to_numpy(), df["src"].to_numpy())
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    edges = keyed_merge(
        links.map_batches(to_pairs, batch_format="pandas"),
        ["a", "b"],
        lambda part: part.drop_duplicates(),
        n_parts,
    )

    if distributed is None:
        # pages × a generous max-avg-degree bound; same dual-path contract
        # as pagerank/dup_clusters (numpy kernel small side, distributed
        # above the cutoff, parity pinned by test)
        distributed = _corpus_meta_rows(sf_dir) * 40 > mem_cutoff
    if not distributed:
        n = _link_triangles_numpy(edges.to_pandas())  # bounded: distinct edges
        return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})

    def degree_partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()])
        g = pd.Series(nodes).value_counts()
        return pd.DataFrame({"node": g.index.to_numpy(), "deg": g.to_numpy().astype("int64")})

    degrees = keyed_merge(
        edges.map_batches(degree_partial, batch_format="pandas"),
        "node",
        lambda part: part.groupby("node", as_index=False)["deg"].sum(),
        n_parts,
    )

    # attach both endpoint degrees via hash joins (node table scales with data)
    with_da = edges.join(
        degrees, join_type="inner", num_partitions=n_parts, on=("a",), right_on=("node",)
    ).rename_columns({"deg": "deg_a"})
    with_db = with_da.join(
        degrees, join_type="inner", num_partitions=n_parts, on=("b",), right_on=("node",)
    ).rename_columns({"deg": "deg_b"})

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        # low (deg, url) -> high (deg, url): bounds out-degree at O(sqrt m)
        a_lo = (df["deg_a"].to_numpy() < df["deg_b"].to_numpy()) | (
            (df["deg_a"].to_numpy() == df["deg_b"].to_numpy())
            & (df["a"].to_numpy() < df["b"].to_numpy())
        )
        return pd.DataFrame(
            {
                "src": np.where(a_lo, df["a"].to_numpy(), df["b"].to_numpy()),
                "dst": np.where(a_lo, df["b"].to_numpy(), df["a"].to_numpy()),
                "dst_deg": np.where(a_lo, df["deg_b"].to_numpy(), df["deg_a"].to_numpy()),
                "dst_is_hi": np.ones(len(df), dtype=bool),
            }
        )

    oriented = with_db.map_batches(orient, batch_format="pandas")

    def wedges(part: pd.DataFrame) -> pd.DataFrame:
        # all neighbor pairs per source, ordered by the same (deg, url) rank
        part = part.sort_values(["src", "dst_deg", "dst"], kind="mergesort")
        src = part["src"].to_numpy()
        dst = part["dst"].to_numpy()
        # segment boundaries per src
        change = np.empty(len(part), dtype=bool)
        if len(part):
            change[0] = True
            change[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(part)))
        outs = []
        for s, L in zip(starts, lens):  # per-vertex pair expansion; L ≤ O(√m)
            if L < 2:
                continue
            nb = dst[s : s + L]
            iu, ju = np.triu_indices(L, k=1)
            outs.append(pd.DataFrame({"p": nb[iu], "q": nb[ju]}))
        if not outs:
            return pd.DataFrame(
                {"p": pd.Series([], dtype="string"), "q": pd.Series([], dtype="string")}
            )
        return pd.concat(outs, ignore_index=True)

    wedge_ds = keyed_merge(oriented, "src", wedges, n_parts)

    def tag_wedge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p": df["p"], "q": df["q"], "is_edge": np.zeros(len(df), dtype="int64")})

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p": df["src"], "q": df["dst"], "is_edge": np.ones(len(df), dtype="int64")})

    tagged = wedge_ds.map_batches(tag_wedge, batch_format="pandas").union(
        oriented.map_batches(tag_edge, batch_format="pandas")
    )

    def close(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["p", "q"])["is_edge"].agg(["size", "max"])
        # wedge rows per closed pair = size - n_edge_rows (edge rows are distinct)
        closed = g[g["max"] == 1]
        n = int((closed["size"] - 1).sum())
        return pd.DataFrame({"n": pd.Series([n], dtype="int64")})

    partials = keyed_merge(tagged, ["p", "q"], close, n_parts).to_pandas()
    return pd.DataFrame({"n_triangles": pd.Series([int(partials["n"].sum())], dtype="int64")})


def link_triangles_sql(sf_dir: str) -> str:
    return f"""
    WITH links AS ({corpus_links_sql(sf_dir)}),
    e AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM links WHERE src <> dst
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
        ) GROUP BY 1
    ),
    o AS (
        SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
               CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst
        FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
    ),
    od AS (SELECT o.src, o.dst, deg.d AS dst_deg FROM o JOIN deg ON deg.node = o.dst),
    w AS (
        SELECT o1.dst AS p, o2.dst AS q
        FROM od o1 JOIN od o2
          ON o1.src = o2.src AND (o1.dst_deg, o1.dst) < (o2.dst_deg, o2.dst)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM w JOIN o ON (w.p = o.src AND w.q = o.dst) OR (w.q = o.src AND w.p = o.dst)
    """


def _link_triangles_numpy(e) -> int:
    """In-memory twin of the distributed path: identical (degree, url)
    orientation, wedge enumeration and closure check over factorized node
    codes — pinned equal to the distributed path by test."""
    import numpy as np
    import pandas as pd

    if not len(e):
        return 0
    codes, uniq = pd.factorize(pd.concat([e["a"], e["b"]], ignore_index=True))
    uniq = np.asarray(uniq)
    n = len(uniq)
    a, b = codes[: len(e)], codes[len(e) :]
    deg = np.bincount(np.concatenate([a, b]), minlength=n)
    lo_is_a = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (uniq[a] < uniq[b]))
    src = np.where(lo_is_a, a, b)
    dst = np.where(lo_is_a, b, a)
    order = np.lexsort((uniq, deg))  # ascending (deg, url)
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[order] = np.arange(n)
    eset = set((src.astype(np.int64) * n + dst).tolist())
    srt = np.lexsort((rank_of[dst], src))
    src_s, dst_s = src[srt], dst[srt]
    change = np.empty(len(src_s), dtype=bool)
    change[0] = True
    change[1:] = src_s[1:] != src_s[:-1]
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, len(src_s)))
    tri = 0
    for st, L in zip(starts, lens):  # out-degree ≤ O(sqrt m) by orientation
        if L < 2:
            continue
        nb = dst_s[st : st + L].astype(np.int64)
        iu, ju = np.triu_indices(L, k=1)
        keys = nb[iu] * n + nb[ju]
        tri += sum(1 for k in keys.tolist() if k in eset)
    return int(tri)
