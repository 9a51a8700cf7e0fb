"""Round-5 batch-25 operators: doc_mix_order (closed-form source-balanced
interleave) and doc_shard_skew (training-shard balance) — serial-parity +
invariant tests."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# doc_mix_order
# ---------------------------------------------------------------------------


def _serial_mix(docs: pd.DataFrame) -> pd.DataFrame:
    """Exact-rational reference via Python fractions."""
    from fractions import Fraction

    docs = docs.dropna(subset=["doc_id", "source"]).copy()
    docs["source"] = docs["source"].astype(str)
    docs = docs.sort_values(["source", "doc_id"]).reset_index(drop=True)
    docs["src_rank"] = docs.groupby("source").cumcount()
    n_s = docs.groupby("source")["doc_id"].transform("size")
    keys = [Fraction(2 * i + 1, 2 * int(n))
            for i, n in zip(docs["src_rank"], n_s)]
    order = sorted(range(len(docs)),
                   key=lambda x: (keys[x], docs["source"].iloc[x],
                                  int(docs["src_rank"].iloc[x])))
    mix = np.empty(len(docs), dtype=np.int64)
    mix[order] = np.arange(1, len(docs) + 1)
    docs["mix_rank"] = mix
    return docs[["doc_id", "source", "src_rank", "mix_rank"]] \
        .astype({"doc_id": "int64", "src_rank": "int64", "mix_rank": "int64"})


def test_mix_order_matches_exact_rational(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q

    out = _collect(Q.doc_mix_order(SF)) \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    ref = _serial_mix(docs).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "source", "src_rank", "mix_rank"]], ref)


def test_mix_order_is_balanced_prefix(ray_session):
    """Any prefix of the stream must contain each source within +-1 of its
    proportional share — the defining property of the interleave."""
    import kgx.queries as Q

    out = _collect(Q.doc_mix_order(SF)).sort_values("mix_rank")
    n = len(out)
    assert sorted(out["mix_rank"]) == list(range(1, n + 1))
    sizes = out.groupby("source")["doc_id"].size()
    for p in (n // 10, n // 3, n // 2):
        prefix = out.head(p)
        got = prefix.groupby("source")["doc_id"].size()
        for src, n_s in sizes.items():
            expected = p * n_s / n
            assert abs(int(got.get(src, 0)) - expected) <= 1.0 + 1e-9, \
                (src, p, int(got.get(src, 0)), expected)


def test_mix_order_unequal_sources(ray_session):
    """Planted unequal sources: a 2-doc source and a 6-doc source must
    interleave 1:3."""
    import ray.data as rd

    from kgx.stages.corpus import mix_order

    docs = pd.DataFrame(
        {"doc_id": list(range(8)),
         "source": ["a"] * 2 + ["b"] * 6})
    out = _collect(mix_order(rd.from_pandas(docs, override_num_blocks=4)))
    ref = _serial_mix(docs)
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True)[ref.columns],
        ref.sort_values("doc_id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# doc_shard_skew
# ---------------------------------------------------------------------------


def test_shard_skew_matches_shuffle_assignment(ray_session):
    import kgx.queries as Q
    from kgx.functions import textstats as ts

    skew = _collect(Q.doc_shard_skew(SF)).sort_values("shard") \
        .reset_index(drop=True)
    shards = _collect(Q.doc_shuffle(SF))
    # doc counts must agree with the doc_shuffle assignment exactly
    ref_counts = shards.groupby("shard")["doc_id"].size()
    for _, row in skew.iterrows():
        assert int(ref_counts.get(row["shard"], 0)) == row["n_docs"]
    # token mass conservation
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    total = int(docs["text"].fillna("").map(ts.n_tokens).sum())
    assert int(skew["n_tokens"].sum()) == total
