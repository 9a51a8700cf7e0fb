"""Dedup-suite correctness: each distributed operator vs a serial
brute-force reference built from the same shared primitives (the oracle
pattern of SURVEY.md §5 — distribution is the only thing under test)."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest

from kgx.functions.text import (
    hamming64,
    md5_fingerprint,
    minhash_from_codes,
    shingle_codes,
    simhash64,
)
from kgx.stages import dedup as D


def docs_table() -> pa.Table:
    """Synthetic corpus with planted exact + near dups."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden trees"
    )
    rows = {
        0: base,
        1: base,                                   # exact dup of 0
        2: base.replace("lazy", "sleepy"),         # near dup of 0
        3: "completely different content about databases and query engines",
        4: "completely different content about databases and query planners",
        5: "",                                     # empty
        6: "short text",
        7: base + " with an extra trailing clause about the evening light",
    }
    return pa.table(
        {"doc_id": list(rows), "text": list(rows.values())},
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(docs_table())


def pairs_set(ds) -> set[tuple[int, int]]:
    t = ds.to_pandas()
    return set(zip(t["id_a"], t["id_b"]))


class TestExactDedup:
    def test_representative_is_min_doc_id(self, docs_ds):
        out = D.exact_dedup(docs_ds).to_pandas()
        by_fp = {r.fp: r for r in out.itertuples()}
        fp0 = md5_fingerprint(docs_table()["text"][0].as_py())
        assert by_fp[fp0].doc_id == 0
        assert by_fp[fp0].group_size == 2
        assert len(out) == 7  # 8 docs, one exact-dup pair

    def test_total_group_size_equals_corpus(self, docs_ds):
        out = D.exact_dedup(docs_ds).to_pandas()
        assert out["group_size"].sum() == 8


class TestNgramJaccard:
    def brute(self, n: float, t: float) -> set[tuple[int, int]]:
        tab = docs_table()
        sets = {
            d: D.ngram_set(x, n)
            for d, x in zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist())
        }
        out = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= t:
                out.add((a, b))
        return out

    @pytest.mark.parametrize("n,t", [(3, 0.8), (3, 0.5), (1, 0.9), (2, 0.6)])
    def test_matches_brute_force(self, docs_ds, n, t):
        got = pairs_set(D.ngram_jaccard_pairs(docs_ds, n=n, threshold=t))
        assert got == self.brute(n, t)

    def test_prefix_bound_math(self):
        # Jaccard >= 0.8 on |S|=10 requires sharing one of the first 3 under
        # any total order: 10 - ceil(0.8*10) + 1 = 3.
        assert D._prefix_len(10, 0.8) == 3
        assert D._prefix_len(1, 0.8) == 1


class TestMinhashLSH:
    def brute(self, num_perm, bands, t, k) -> set[tuple[int, int]]:
        tab = docs_table()
        sigs = {}
        for d, x in zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()):
            codes = shingle_codes(x, k=k)
            if len(codes):
                sigs[d] = minhash_from_codes(codes, num_perm=num_perm)
        rows_per_band = num_perm // bands
        out = set()
        for a, b in itertools.combinations(sorted(sigs), 2):
            sa, sb = sigs[a], sigs[b]
            shares_band = any(
                np.array_equal(
                    sa[i * rows_per_band : (i + 1) * rows_per_band],
                    sb[i * rows_per_band : (i + 1) * rows_per_band],
                )
                for i in range(bands)
            )
            est = float((sa == sb).mean())
            if shares_band and est >= t:
                out.add((a, b))
        return out

    def test_matches_serial_reference(self, docs_ds):
        got = pairs_set(
            D.minhash_lsh_pairs(docs_ds, num_perm=64, bands=16, threshold=0.5)
        )
        assert got == self.brute(64, 16, 0.5, 5)

    def test_planted_near_dups_found(self, docs_ds):
        got = pairs_set(
            D.minhash_lsh_pairs(docs_ds, num_perm=64, bands=16, threshold=0.5)
        )
        assert (0, 1) in got  # exact dup always survives


class TestSimhash:
    def test_matches_brute_force(self, docs_ds):
        got = pairs_set(D.simhash_pairs(docs_ds, max_hamming=3))
        tab = docs_table()
        sims = {
            d: simhash64(x)
            for d, x in zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist())
            if x.strip()
        }
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(sims), 2)
            if hamming64(sims[a], sims[b]) <= 3
        }
        assert got == want
        assert (0, 1) in got

    def test_pigeonhole_guard(self, docs_ds):
        with pytest.raises(ValueError):
            D.simhash_pairs(docs_ds, max_hamming=5, bands=4)


class TestEmbeddingDup:
    def test_matches_brute_force(self, ray_session):
        import ray
        import ray.data as rd

        rng = [
            [((i * 7 + j * 13) % 17 - 8) / 8.0 for j in range(8)] for i in range(30)
        ]
        rng[5] = rng[3]  # planted duplicate vector
        tab = pa.table(
            {"vec_id": list(range(30)), "embedding": rng},
            schema=pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            ),
        )
        ids, mat = D.normalized_matrix(tab)
        want = {
            (int(ids[i]), int(ids[j]))
            for i, j in itertools.combinations(range(len(ids)), 2)
            if float(mat[i] @ mat[j]) >= 0.95
        }
        ref = ray.put((ids, mat))
        got = pairs_set(
            D.embedding_dup_pairs(rd.from_arrow(tab), ref, threshold=0.95)
        )
        assert got == want
        assert (3, 5) in got


class TestEmbeddingDedupGate:
    """r5: the cost-gated default (brute below EMB_BRUTE_LIMIT, LSH-bucketed
    banded path above) — both-paths agreement on planted near-dups, recall
    vs brute at the near-dup threshold, and the hot-bucket window path."""

    @staticmethod
    def _corpus(n=120, dim=16, n_dups=8):
        """Well-separated pseudo-random vectors + planted exact/near dups."""
        rng = np.random.default_rng(11)
        mat = rng.normal(size=(n, dim))
        planted = set()
        for i in range(n_dups):
            a, b = 2 * i, 2 * i + 1
            mat[b] = mat[a] + rng.normal(scale=1e-3, size=dim)  # near-identical
            planted.add((a, b))
        tab = pa.table(
            {"vec_id": list(range(n)),
             "embedding": [[float(x) for x in row] for row in mat]},
            schema=pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            ),
        )
        return tab, planted

    def _brute(self, tab, threshold):
        ids, mat = D.normalized_matrix(tab)
        return {
            (int(ids[i]), int(ids[j]))
            for i, j in itertools.combinations(range(len(ids)), 2)
            if float(mat[i] @ mat[j]) >= threshold
        }

    def test_gate_takes_brute_below_limit(self, ray_session):
        import ray.data as rd

        tab, planted = self._corpus()
        got = pairs_set(
            D.embedding_dup_pairs_gated(rd.from_arrow(tab), threshold=0.95)
        )
        assert got == self._brute(tab, 0.95)
        assert planted <= got

    def test_forced_lsh_path_agrees_on_planted_dups(self, ray_session):
        import ray.data as rd

        tab, planted = self._corpus()
        want = self._brute(tab, 0.95)
        got = pairs_set(
            D.embedding_dup_pairs_gated(rd.from_arrow(tab), threshold=0.95,
                                        brute_limit=0)
        )
        # exact in-bucket verify: no false positives, ever
        assert got <= want
        # deterministic planes + near-identical planted vectors: every
        # planted pair lands in a shared bucket
        assert planted <= got
        # recall vs brute at the near-dup threshold
        assert len(got) >= 0.9 * len(want)

    def test_lsh_hot_bucket_window_path_keeps_identical_pairs(self, ray_session):
        import ray.data as rd

        # one degenerate bucket: > VERIFY_GROUP_CAP copies of the SAME vector
        # (every table's bucket is identical) — the sorted-window path must
        # still chain all of them (connectivity preservation)
        n = D.VERIFY_GROUP_CAP + 10
        tab = pa.table(
            {"vec_id": list(range(n)), "embedding": [[1.0, 0.5, -0.25]] * n},
            schema=pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            ),
        )
        got = pairs_set(D.embedding_dup_pairs_lsh(
            rd.from_arrow(tab), threshold=0.99
        ))
        # windowed, not all-pairs: adjacent chain must be present
        chain = {(i, i + 1) for i in range(n - 1)}
        assert chain <= got
        assert len(got) < n * (n - 1) // 2  # the cap actually bounded work
