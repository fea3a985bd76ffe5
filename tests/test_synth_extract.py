"""Corpus generator + span link-extraction unit tests (SURVEY.md §5.1, M2)."""

import pyarrow as pa
import pyarrow.compute as pc

from crawler_ray import schemas
from crawler_ray.functions.extract import extract_links, span_kind_counts
from crawler_ray.synth import CorpusSpec, gen_corpus, gen_host_docs


def test_corpus_deterministic_and_shardable(small_spec, small_corpus):
    again = gen_corpus(small_spec)
    assert small_corpus.equals(again)
    # per-host generation is independent → sharded == whole
    host0 = gen_host_docs(small_spec, 0)
    assert host0.equals(small_corpus.slice(0, host0.num_rows))


def test_corpus_shape(small_spec, small_corpus):
    assert small_corpus.schema.equals(schemas.CORPUS)
    ids = small_corpus.column("doc_id").to_pylist()
    for i in range(small_spec.n_hosts):
        host = small_spec.host(i)
        assert f"https://{host}/" in ids
        assert f"https://{host}/sitemap.xml" in ids
    # offsets strictly increasing 0..n-1 per doc
    spans = small_corpus.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy()
    offs = pc.struct_field(flat, "offset").to_numpy()
    import numpy as np

    starts = np.flatnonzero(np.diff(parents, prepend=-1))
    expected = np.arange(len(offs)) - np.repeat(starts, np.diff(np.append(starts, len(offs))))
    assert (offs == expected).all()


def _fetched_batch(corpus: pa.Table) -> pa.Table:
    n = corpus.num_rows
    return pa.Table.from_arrays(
        [
            corpus.column("doc_id").combine_chunks(),
            pa.array([0] * n, pa.int32()),
            pa.array(["c1"] * n, pa.string()),
            corpus.column("spans").combine_chunks(),
        ],
        names=["url", "depth", "crawl_id", "spans"],
    )


def test_extract_links_matches_python_loop(small_corpus):
    batch = _fetched_batch(small_corpus)
    out = extract_links(batch)
    assert out.schema.equals(schemas.LINKS)
    # independent slow-path oracle: python loop over rows
    want = []
    for row in small_corpus.to_pylist():
        for sp in row["spans"]:
            if sp["kind"] == "link":
                want.append((row["doc_id"], sp["text"]))
    got = list(zip(out.column("src").to_pylist(), out.column("dst").to_pylist()))
    # corpus targets are already normalized-form, so equality is exact
    assert got == want
    assert out.column("depth").to_pylist() == [1] * len(want)
    hosts = out.column("dst_host").to_pylist()
    assert all(h and h.endswith(".test") for h in hosts)


def test_extract_links_order_preserving(small_corpus):
    """Per-row invariant (§1.2): link emission preserves span document order."""
    one = small_corpus.slice(0, 1)
    batch = _fetched_batch(one)
    out = extract_links(batch)
    row = one.to_pylist()[0]
    targets = [sp["text"] for sp in row["spans"] if sp["kind"] == "link"]
    assert out.column("dst").to_pylist() == targets


def test_span_kind_counts(small_corpus):
    prof = span_kind_counts(small_corpus.slice(0, 20))
    rows = small_corpus.slice(0, 20).to_pylist()
    for i, row in enumerate(rows):
        for kind in ("text", "link", "media"):
            want = sum(1 for sp in row["spans"] if sp["kind"] == kind)
            assert prof.column(f"n_{kind}")[i].as_py() == want
