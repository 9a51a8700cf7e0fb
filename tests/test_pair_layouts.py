"""Slim vs inline pair layouts must produce IDENTICAL pair sets.

The slim layout (keys-only band/prefix rows + payload-resolving exchanges;
VERDICT r2 next-round #4) is a pure shuffle-volume optimization: candidate
buckets, bounded-window policy, and verification predicates are unchanged, so
on any corpus whose buckets sit below VERIFY_GROUP_CAP the outputs are equal
row-for-row.  Verified here on the driver corpus (planted near-dup pairs) and
on a synthetic corpus with exact-duplicate clusters.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from kgx.stages.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

SF_DIR = "/root/testdata/sf0.001"


def _pairs(ds) -> set[tuple[int, int]]:
    out = set()
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        out.update(zip(b["id_a"].to_pylist(), b["id_b"].to_pylist()))
    return out


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )


@pytest.fixture()
def dup_cluster_ds(ray_session):
    """60 docs in 12 clusters of 5 near-identical members + filler."""
    import ray.data as rd

    rows = {"doc_id": [], "text": []}
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    for c in range(12):
        base = " ".join(words[(c + i) % len(words)] for i in range(30))
        for m in range(5):
            rows["doc_id"].append(c * 5 + m)
            # identical text -> jaccard 1.0, minhash est 1.0
            rows["text"].append(base)
    for f in range(40):
        rows["doc_id"].append(100 + f)
        rows["text"].append(
            " ".join(words[(f * (i + 3)) % len(words)] for i in range(25))
            + f" unique{f} marker{f * 7}"
        )
    return rd.from_arrow(pa.table(rows))


def test_minhash_layouts_equal_driver_corpus(docs_ds):
    inline = _pairs(minhash_lsh_pairs(docs_ds, layout="inline"))
    slim = _pairs(minhash_lsh_pairs(docs_ds, layout="slim"))
    assert inline == slim
    assert len(inline) > 0  # planted near-dups exist at every sf


def test_ngram_layouts_equal_driver_corpus(docs_ds):
    inline = _pairs(ngram_jaccard_pairs(docs_ds, n=3, threshold=0.8, layout="inline"))
    slim = _pairs(ngram_jaccard_pairs(docs_ds, n=3, threshold=0.8, layout="slim"))
    assert inline == slim
    assert len(inline) > 0


def test_layouts_equal_dup_clusters(dup_cluster_ds):
    for fn, kw in [
        (minhash_lsh_pairs, {}),
        (ngram_jaccard_pairs, {"n": 3, "threshold": 0.8}),
    ]:
        inline = _pairs(fn(dup_cluster_ds, layout="inline", **kw))
        slim = _pairs(fn(dup_cluster_ds, layout="slim", **kw))
        assert inline == slim
        # every 5-clique must be fully connected (10 pairs x 12 clusters)
        clique = {(c * 5 + i, c * 5 + j) for c in range(12)
                  for i in range(5) for j in range(i + 1, 5)}
        assert clique <= inline
