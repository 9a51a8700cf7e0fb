"""Similarity-search correctness: exact top-k vs numpy brute force, LSH
variant recall, deterministic tie-breaks."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from kgx.stages import similarity as S
from kgx.stages.dedup import normalized_matrix


def emb_table(n: int = 60, dim: int = 16) -> pa.Table:
    vecs = [
        [((i * 31 + j * 7) % 23 - 11) / 11.0 for j in range(dim)] for i in range(n)
    ]
    return pa.table(
        {"vec_id": list(range(n)), "embedding": vecs},
        schema=pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
        ),
    )


def brute_topk(tab: pa.Table, every: int, k: int) -> dict[int, list[int]]:
    ids, mat = normalized_matrix(tab)
    out = {}
    for qi, qid in enumerate(ids):
        if qid % every:
            continue
        s = mat @ mat[qi]
        order = np.lexsort((ids, -s))
        out[int(qid)] = [int(ids[o]) for o in order if ids[o] != qid][:k]
    return out


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(emb_table())


class TestAnnTopk:
    def test_matches_brute_force(self, ray_session, emb_ds):
        import ray

        tab = emb_table()
        q_ref = ray.put(S.build_query_side(tab, every=10))
        got = S.ann_topk(emb_ds, q_ref, k=5).to_pandas()
        want = brute_topk(tab, every=10, k=5)
        for qid, neighbors in want.items():
            rows = got[got.query_id == qid].sort_values("rank")
            assert rows["neighbor_id"].tolist() == neighbors
            assert rows["rank"].tolist() == list(range(1, len(neighbors) + 1))

    def test_excludes_self(self, ray_session, emb_ds):
        import ray

        q_ref = ray.put(S.build_query_side(emb_table(), every=10))
        got = S.ann_topk(emb_ds, q_ref, k=5).to_pandas()
        assert not (got.query_id == got.neighbor_id).any()


class TestAnnTopkLSH:
    def test_recall_vs_brute_force(self, ray_session, emb_ds):
        import ray

        tab = emb_table()
        q_ref = ray.put(S.build_lsh_query_side(tab, every=10, nbits=6, tables=8))
        got = S.ann_topk_lsh(emb_ds, q_ref, k=5, nbits=6, tables=8).to_pandas()
        want = brute_topk(tab, every=10, k=5)
        hits = total = 0
        for qid, neighbors in want.items():
            approx = set(got[got.query_id == qid]["neighbor_id"])
            hits += len(approx & set(neighbors))
            total += len(neighbors)
        assert hits / total >= 0.5  # probabilistic, deterministic planes

    def test_planes_deterministic(self):
        p1 = S.lsh_planes(8, 4, 2)
        p2 = S.lsh_planes(8, 4, 2)
        assert np.array_equal(p1, p2)


class TestAnnTopkIVF:
    def test_recall_vs_brute_force(self, ray_session, emb_ds):
        import ray

        tab = emb_table()
        q_ref = ray.put(S.build_ivf_query_side(tab, every=10, n_lists=8, nprobe=3))
        got = S.ann_topk_ivf(emb_ds, q_ref, k=5, nprobe=3).to_pandas()
        want = brute_topk(tab, every=10, k=5)
        hits = total = 0
        for qid, neighbors in want.items():
            approx = set(got[got.query_id == qid]["neighbor_id"])
            hits += len(approx & set(neighbors))
            total += len(neighbors)
        assert hits / total >= 0.4  # 3 of 8 lists probed

    def test_centroids_deterministic_and_normalized(self):
        _, mat = S.build_query_side(emb_table(), every=1)
        c1 = S.ivf_train(mat, 8)
        c2 = S.ivf_train(mat, 8)
        assert np.array_equal(c1, c2)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)
