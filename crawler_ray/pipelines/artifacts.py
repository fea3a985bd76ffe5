"""Deterministic side-output artifacts for oracle checking.

The sketch-based pipelines (MinHash/SimHash/embedding LSH, winnowing, ANN)
produce candidate sets that pure SQL cannot regenerate (numpy uint64 rolling
hashes, random hyperplanes). What SQL *can* check is every deterministic step
given those intermediates: signature-estimated Jaccard, exact hamming
distance, exact n-gram Jaccard, connected components over the verified pair
list, exact cosine over probed cells. So each such pipeline dumps its small
intermediates (signatures, candidate pairs, fingerprints, probe sets) to a
parquet artifact under ``/tmp/crawler_ray_artifacts/<key>/`` and the oracle
SQL recomputes the final answer FROM THE ARTIFACTS + the source tables —
turning a rows-only check into a full rows+schema+value hash check of the
verification/aggregation math (VERDICT r3 #1).

Keying: the artifact directory hashes the sf_dir path plus mtime/size of the
source parquets, so regenerated testdata invalidates automatically.  Writes
are atomic (tmp + rename) and idempotent — the pipelines recompute the same
bytes, so a lost cross-process race is harmless.  ``oracle_sql()`` calls
:func:`ensure` so the artifacts exist regardless of whether the driver runs
the Ray query or the oracle first.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

_ROOT = "/tmp/crawler_ray_artifacts"


def artifact_dir(sf_dir: str) -> str:
    parts = [os.path.abspath(sf_dir)]
    for t in ("documents.parquet", "embeddings.parquet"):
        p = os.path.join(sf_dir, t)
        if os.path.exists(p):
            st = os.stat(p)
            parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
    key = hashlib.md5("|".join(parts).encode()).hexdigest()[:12]
    return os.path.join(_ROOT, key)


def artifact_path(sf_dir: str, name: str) -> str:
    return os.path.join(artifact_dir(sf_dir), f"{name}.parquet")


def have(sf_dir: str, *names: str) -> bool:
    return all(os.path.exists(artifact_path(sf_dir, n)) for n in names)


def write(sf_dir: str, name: str, table: pa.Table) -> str:
    """Atomic idempotent parquet dump; skips when the artifact already
    exists (content is deterministic per key)."""
    path = artifact_path(sf_dir, name)
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    try:
        os.replace(tmp, path)
    except OSError:
        if os.path.exists(tmp):
            os.remove(tmp)
        if not os.path.exists(path):
            raise
    return path


def write_dataset(sf_dir: str, name: str, ds, columns=None) -> str:
    """Dump a (small) Dataset artifact via a driver-side Arrow collect —
    artifacts are signatures/pairs/probe sets, orders of magnitude smaller
    than the corpus; the corpus itself never flows through here."""
    path = artifact_path(sf_dir, name)
    if os.path.exists(path):
        return path
    if columns is not None:
        ds = ds.select_columns(columns)
    tables = [b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")]
    if tables:
        table = pa.concat_tables(tables)
    else:
        # ray.data's Schema wrapper has no empty_table(); rebuild an empty
        # Arrow table from its names/types so a zero-candidate pipeline
        # still writes a (schema-complete) empty artifact
        s = ds.schema()
        table = pa.table(
            {n: pa.array([], type=t) for n, t in zip(s.names, s.types)}
        )
    return write(sf_dir, name, table)


def ensure(sf_dir: str) -> None:
    """Make every oracle-referenced artifact for ``sf_dir`` exist, running
    the producing pipelines only for the missing ones (Ray must already be
    initialised — the driver and the test session both do)."""
    from . import dedup as D
    from . import similarity as S
    from . import text as T

    # the dumps happen EAGERLY inside each call (write_dataset iterates the
    # intermediate datasets at call time), so the returned pipeline is left
    # unexecuted — materializing it here would pay the expensive
    # verification stage (pairs×signatures joins, cosine verify) just to
    # produce artifacts that already exist by the time the call returns
    if not have(sf_dir, "minhash_sigs", "minhash_cands"):
        D.minhash_pairs(sf_dir, dump_artifacts=True)
    if not have(sf_dir, "simhash_sigs", "simhash_cands"):
        D.simhash_pairs(sf_dir, dump_artifacts=True)
    if not have(sf_dir, "emb_cands"):
        # fixture-tuned params — must match the registered query exactly
        D.embedding_dup_pairs(sf_dir, threshold=0.4, n_planes=6, dump_artifacts=True)
    if not have(sf_dir, "winnow_fps", "winnow_grams"):
        T.winnow_fingerprints(sf_dir, dump_artifacts=True)
    if not have(sf_dir, "decon_eval_fps"):
        _ensure_decon_eval(sf_dir)
    if not have(sf_dir, "lsh_assign", "lsh_probes"):
        S.ann_lsh(sf_dir, dump_artifacts=True)
    if not have(sf_dir, "ivf_probes"):
        S.ann_ivf(sf_dir, dump_artifacts=True)


def _ensure_decon_eval(sf_dir: str) -> None:
    """The decontaminate demo's eval set = corpus texts 5/50/200 — the same
    selection ``__ray_entry__._decontaminate_demo`` makes."""
    import numpy as np
    import pandas as pd

    from .text import _winnow_batch_kernel

    texts = (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
        .column("text")
        .to_pylist()
    )
    evals = [texts[i] for i in (5, 50, 200) if i < len(texts)]
    kernel = _winnow_batch_kernel(5, 4)
    fps = np.unique(
        kernel(
            pd.DataFrame(
                {"doc_id": np.arange(len(evals), dtype=np.int64), "text": evals}
            )
        )["fingerprint"].to_numpy(zero_copy_only=False)
    )
    write(sf_dir, "decon_eval_fps", pa.table({"fingerprint": pa.array(fps)}))
