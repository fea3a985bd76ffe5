"""Deterministic synthetic corpus generator (FIXTURES.md §1-3).

Generates the "web" the engine crawls: a table of interleaved text+media
documents where ``doc_id`` is the page URL and ``kind='link'`` spans define the
crawl graph (BASELINE.json input_hint). Generation is deterministic per
``(seed, host_index)`` — every host's documents derive from an independent RNG
stream — so shards can be generated in parallel (driver-side or via Ray tasks)
and the composed corpus is identical regardless of sharding.

No external data, no network. Pure numpy + pyarrow.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import schemas

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua".split()
)


@dataclass(frozen=True)
class CorpusSpec:
    """Parameters of the deterministic corpus (FIXTURES.md §1 defaults)."""

    seed: int = 42
    n_hosts: int = 8
    pages_per_host: int = 50
    min_spans: int = 5
    max_spans: int = 30
    p_link: float = 0.3
    p_media: float = 0.2
    # p_text = 1 - p_link - p_media
    p_cross_host: float = 0.1
    p_dup_link: float = 0.15
    p_dangling: float = 0.05
    p_subdomain: float = 0.05
    hot_host_factor: int = 1          # host 0 gets ×factor pages (skew/salting tests)
    n_subdomain_pages: int = 3        # pages on sub.{host} so subdomains=True finds them
    words_per_text: int = 4           # words per text span (bench uses larger pages)

    def host(self, i: int) -> str:
        return f"site-{i:04d}.test"

    def host_page_count(self, i: int) -> int:
        return self.pages_per_host * (self.hot_host_factor if i == 0 else 1)

    GEN_VERSION = 4  # bump when generator content changes for identical specs

    def cache_key(self) -> str:
        return hashlib.sha1(f"{self!r}v{self.GEN_VERSION}".encode()).hexdigest()[:12]


def _host_rng(spec: CorpusSpec, host_index: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([spec.seed, host_index]))


def _page_urls(spec: CorpusSpec, i: int) -> list[str]:
    host = spec.host(i)
    urls = [f"https://{host}/"]
    urls += [f"https://{host}/page-{j:04d}" for j in range(1, spec.host_page_count(i))]
    return urls


def _sub_urls(spec: CorpusSpec, i: int) -> list[str]:
    host = spec.host(i)
    return [f"https://sub.{host}/page-{j:04d}" for j in range(spec.n_subdomain_pages)]


def gen_host_docs(spec: CorpusSpec, host_index: int) -> pa.Table:
    """All corpus rows for one host: landing page, content pages, subdomain
    pages, and the sitemap doc. Deterministic in (spec.seed, host_index)."""
    rng = _host_rng(spec, host_index)
    host = spec.host(host_index)
    pages = _page_urls(spec, host_index)
    subs = _sub_urls(spec, host_index)
    all_docs = pages + subs

    doc_ids: list[str] = []
    # flat span columns (one list offset array at the end → cheap Arrow build)
    kinds: list[str] = []
    texts: list[str] = []
    media: list[str] = []
    offs: list[int] = []
    span_lengths: list[int] = []

    n_docs = len(all_docs)
    span_counts = rng.integers(spec.min_spans, spec.max_spans + 1, size=n_docs)
    total = int(span_counts.sum())
    kind_draw = rng.random(total)
    sub_draw = rng.random(total)
    cross_draw = rng.random(total)
    dangle_draw = rng.random(total)
    dup_draw = rng.random(total)
    tgt_draw = rng.integers(0, 1 << 30, size=total)
    word_draw = rng.integers(0, len(_WORDS), size=(total, spec.words_per_text))
    pos = 0

    for d, url in enumerate(all_docs):
        n = int(span_counts[d])
        doc_ids.append(url)
        span_lengths.append(n)
        prev_targets: list[str] = []
        for s in range(n):
            k = pos
            pos += 1
            r = kind_draw[k]
            if r < spec.p_link:
                # choose a link target
                if prev_targets and dup_draw[k] < spec.p_dup_link:
                    tgt = prev_targets[int(tgt_draw[k]) % len(prev_targets)]
                elif dangle_draw[k] < spec.p_dangling:
                    tgt = f"https://{host}/missing-{int(tgt_draw[k]) % 10_000:04d}"
                elif sub_draw[k] < spec.p_subdomain:
                    tgt = subs[int(tgt_draw[k]) % len(subs)]
                elif cross_draw[k] < spec.p_cross_host and spec.n_hosts > 1:
                    oh = (host_index + 1 + int(tgt_draw[k]) % (spec.n_hosts - 1)) % spec.n_hosts
                    opages = spec.host_page_count(oh)
                    j = int(tgt_draw[k]) % opages
                    tgt = (
                        f"https://{spec.host(oh)}/"
                        if j == 0
                        else f"https://{spec.host(oh)}/page-{j:04d}"
                    )
                else:
                    j = int(tgt_draw[k]) % len(pages)
                    tgt = pages[j]
                prev_targets.append(tgt)
                kinds.append("link")
                texts.append(tgt)
                media.append("")
            elif r < spec.p_link + spec.p_media:
                kinds.append("media")
                texts.append("")
                media.append(
                    f"media://site-{host_index:04d}/img-{int(tgt_draw[k]) % 10_000:04d}.ppm"
                )
            else:
                kinds.append("text")
                texts.append(" ".join(_WORDS[w] for w in word_draw[k]))
                media.append("")
            offs.append(s)

    # sitemap doc: links to every other content page (deterministic subset, D2/S4)
    sitemap_targets = pages[::2]
    doc_ids.append(f"https://{host}/sitemap.xml")
    span_lengths.append(len(sitemap_targets))
    for s, tgt in enumerate(sitemap_targets):
        kinds.append("link")
        texts.append(tgt)
        media.append("")
        offs.append(s)

    # robots.txt doc: one text span per rule line, mirroring gen_robots (S5 —
    # the engine learns robots by fetching this doc; delay unit is ms)
    r_disallow, r_delay = _robots_rules(spec, host_index)
    lines = [f"Disallow: {p}" for p in r_disallow]
    if r_delay:
        lines.append(f"Crawl-delay: {r_delay}")
    if not lines:
        lines = ["Allow: /"]
    doc_ids.append(f"https://{host}/robots.txt")
    span_lengths.append(len(lines))
    for s, line in enumerate(lines):
        kinds.append("text")
        texts.append(line)
        media.append("")
        offs.append(s)

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(media, pa.string()),
            pa.array(offs, pa.int32()),
        ],
        fields=list(schemas.SPAN_STRUCT),
    )
    offsets = pa.array(np.concatenate([[0], np.cumsum(span_lengths)]).astype(np.int32))
    spans = pa.ListArray.from_arrays(offsets, struct)
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), spans], schema=schemas.CORPUS
    )


def gen_corpus(spec: CorpusSpec) -> pa.Table:
    """The full corpus as one Arrow table (test scale; shard by host at bench)."""
    return pa.concat_tables([gen_host_docs(spec, i) for i in range(spec.n_hosts)])


def _robots_rules(spec: CorpusSpec, i: int) -> tuple[list[str], int]:
    """Rule mix per FIXTURES.md §3: host 1 disallows everything, host 2 a
    subtree, host 3 a large crawl delay, the rest permissive."""
    if i == 1 and spec.n_hosts > 1:
        return ["/"], 0
    if i == 2 and spec.n_hosts > 2:
        return ["/page-000"], 0
    if i == 3 and spec.n_hosts > 3:
        return [], 2000
    if i == 4 and spec.n_hosts > 4:
        # RFC 9309 §2.2.3 wildcard rules: mid-pattern '*' + end-anchor '$'
        return ["/page-*1", "/page-0002$"], 0
    return [], 0


def gen_robots(spec: CorpusSpec) -> pa.Table:
    """Per-host robots fixtures table (same rules the corpus robots.txt docs
    encode — either source yields identical crawl behavior)."""
    hosts, disallow, delay = [], [], []
    for i in range(spec.n_hosts):
        hosts.append(spec.host(i))
        d, ms = _robots_rules(spec, i)
        disallow.append(d)
        delay.append(ms)
    return pa.Table.from_arrays(
        [
            pa.array(hosts, pa.string()),
            pa.array(disallow, pa.list_(pa.string())),
            pa.array(delay, pa.int64()),
        ],
        schema=schemas.ROBOTS,
    )


# ---------------------------- media payloads ------------------------------ #
#
# Every media_ref resolves to a REAL uncompressed image: a binary P6 PPM
# whose header is fixed-width (13 bytes: b"P6\nWW HH\n255\n", dims 10..40 so
# both are always two digits) followed by H*W*3 raw RGB bytes. Deterministic
# per ref (sha1-seeded RNG), so shards can generate payloads independently
# and SQL oracles can parse dims straight out of the header bytes.

PPM_HEADER_LEN = 13


def ppm_bytes(ref: str) -> bytes:
    """Deterministic P6 PPM payload for one media ref."""
    seed = int.from_bytes(hashlib.sha1(ref.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    w = int(rng.integers(10, 41))
    h = int(rng.integers(10, 41))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    header = f"P6\n{w:02d} {h:02d}\n255\n".encode()
    assert len(header) == PPM_HEADER_LEN
    return header + px.tobytes()


def gen_media(corpus: pa.Table) -> pa.Table:
    """Distinct media refs of a corpus table → (media_ref, payload) blobs."""
    import pyarrow.compute as pc

    flat = pc.list_flatten(corpus["spans"].combine_chunks())
    is_media = pc.equal(pc.struct_field(flat, "kind"), "media")
    refs = sorted(
        pc.unique(pc.filter(pc.struct_field(flat, "media_ref"), is_media)).to_pylist()
    )
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "payload": pa.array([ppm_bytes(r) for r in refs], pa.binary()),
        }
    )


def media_path(spec: CorpusSpec, root: str = "/tmp/crawler_ray_corpus") -> str:
    """Write (once) and return the media payload parquet for this spec."""
    cp = corpus_path(spec, root)
    path = os.path.join(root, spec.cache_key(), "media.parquet")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(gen_media(pq.read_table(cp)), tmp)
        os.replace(tmp, path)
    return path


def corpus_path(spec: CorpusSpec, root: str = "/tmp/crawler_ray_corpus") -> str:
    """Write (once) and return the parquet path of the corpus for this spec.

    Cached by spec hash so tests/bench/oracle-SQL all read identical bytes."""
    d = os.path.join(root, spec.cache_key())
    path = os.path.join(d, "corpus.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(gen_corpus(spec), tmp)
        os.replace(tmp, path)
        pq.write_table(gen_robots(spec), os.path.join(d, "robots.parquet"))
    return path


def robots_path(spec: CorpusSpec, root: str = "/tmp/crawler_ray_corpus") -> str:
    corpus_path(spec, root)
    return os.path.join(root, spec.cache_key(), "robots.parquet")
