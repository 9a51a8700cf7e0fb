"""Round-5 operators: grouped HLL, per-label centroids, user retention,
winnowing fingerprints — serial-parity + hostile-null + property tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kgx.functions.text import stable_hash64, tokenize


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


# ---------------------------------------------------------------------------
# grouped HLL
# ---------------------------------------------------------------------------


def _serial_grouped_hll(events: list[tuple[str, int]]):
    from kgx.stages.sketch import HLL_B

    w_bits = 64 - HLL_B
    out: dict[tuple[str, int], int] = {}
    for et, uid in set(events):
        h = stable_hash64(str(uid))
        reg = h >> w_bits
        w = h & ((1 << w_bits) - 1)
        rank = w_bits + 1 - w.bit_length() if w else w_bits + 1
        key = (et, reg)
        out[key] = max(out.get(key, 0), rank)
    return out


def test_hll_grouped_matches_serial(ray_session):
    import ray.data as rd

    from kgx.stages.sketch import hll_grouped_registers

    rng = np.random.default_rng(5)
    ets = rng.choice(["view", "click", "buy"], size=3000).tolist()
    uids = rng.integers(0, 400, size=3000).tolist()
    tbl = pa.table({"event_type": ets, "user_id": pa.array(uids, pa.int64())})
    got = _collect(hll_grouped_registers(rd.from_arrow(tbl).repartition(7)))
    want = _serial_grouped_hll(list(zip(ets, uids)))
    got_map = {
        (r.event_type, r.register): r.max_rank for r in got.itertuples()
    }
    assert got_map == want


def test_hll_grouped_estimate_accuracy(ray_session):
    """The per-group estimate from the grouped registers lands within the
    HLL error envelope for well-separated group cardinalities."""
    import ray.data as rd

    from kgx.stages.sketch import HLL_M, hll_estimate, hll_grouped_registers

    rng = np.random.default_rng(17)
    rows_et, rows_uid = [], []
    true = {"a": 200, "b": 2000}
    for et, n in true.items():
        ids = rng.choice(10**9, size=n, replace=False)
        rows_et += [et] * n
        rows_uid += ids.tolist()
    tbl = pa.table(
        {"event_type": rows_et, "user_id": pa.array(rows_uid, pa.int64())}
    )
    got = _collect(hll_grouped_registers(rd.from_arrow(tbl).repartition(5)))
    for et, n in true.items():
        dense = np.zeros(HLL_M, dtype=np.int64)
        sub = got[got["event_type"] == et]
        dense[sub["register"].to_numpy()] = sub["max_rank"].to_numpy()
        est = hll_estimate(dense)
        assert abs(est - n) / n < 0.25  # 3.8 sigma at m=256


def test_hll_grouped_drops_nulls(ray_session):
    import ray.data as rd

    from kgx.stages.sketch import hll_grouped_registers

    tbl = pa.table(
        {"event_type": pa.array(["a", None, "a"]),
         "user_id": pa.array([1, 2, None], pa.int64())}
    )
    got = _collect(hll_grouped_registers(rd.from_arrow(tbl)))
    want = _serial_grouped_hll([("a", 1)])
    assert {(r.event_type, r.register): r.max_rank
            for r in got.itertuples()} == want


# ---------------------------------------------------------------------------
# per-label centroids
# ---------------------------------------------------------------------------


def test_label_centroids_match_numpy(ray_session):
    import ray.data as rd

    from kgx.stages.kmeans import KM_SCALE, label_centroids

    rng = np.random.default_rng(23)
    n, d = 300, 8
    mat = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 5, size=n).astype(np.int32)
    tbl = pa.table(
        {"label": pa.array(labels, pa.int32()),
         "embedding": pa.array([row.tolist() for row in mat],
                               pa.list_(pa.float32()))}
    )
    got = _collect(label_centroids(rd.from_arrow(tbl).repartition(9)))
    q = np.floor(mat.astype(np.float64) * KM_SCALE + 0.5).astype(np.int64)
    for lbl in range(5):
        sub = got[got["label"] == lbl].sort_values("dim")
        sel = q[labels == lbl]
        assert sub["sum_q"].to_numpy().tolist() == sel.sum(axis=0).tolist()
        assert (sub["n_vecs"] == len(sel)).all()
    # centroid recovery: floor-mean reproducible from the long rows
    sub = got[got["label"] == 0].sort_values("dim")
    cent = sub["sum_q"].to_numpy() // sub["n_vecs"].to_numpy()
    sel = q[labels == 0]
    assert cent.tolist() == (sel.sum(axis=0) // len(sel)).tolist()


def test_label_centroids_drop_nulls(ray_session):
    import ray.data as rd

    from kgx.stages.kmeans import KM_SCALE, label_centroids

    tbl = pa.table(
        {"label": pa.array([0, None, 0], pa.int32()),
         "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], None],
                               pa.list_(pa.float32()))}
    )
    got = _collect(label_centroids(rd.from_arrow(tbl))).sort_values(
        "dim"
    ).reset_index(drop=True)
    assert got["label"].tolist() == [0, 0]
    assert got["sum_q"].tolist() == [1 * KM_SCALE, 2 * KM_SCALE]
    assert got["n_vecs"].tolist() == [1, 1]


# ---------------------------------------------------------------------------
# user retention
# ---------------------------------------------------------------------------


def test_user_retention_matches_serial(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from kgx.pipelines.relational import RETAIN_US, user_retention

    rng = np.random.default_rng(31)
    n = 2000
    base = np.datetime64("2025-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 90 * 86_400_000_000, size=n).astype(
        "timedelta64[us]"
    )
    users = rng.integers(0, 80, size=n)
    tbl = pa.table(
        {"user_id": pa.array(users, pa.int64()),
         "ts": pa.array(ts.astype("datetime64[us]"))}
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = _collect(user_retention(str(tmp_path))).sort_values(
        "user_id"
    ).reset_index(drop=True)
    df = pd.DataFrame({"user_id": users, "us": ts.astype("int64")})
    want = df.groupby("user_id").agg(
        n_events=("us", "size"), mn=("us", "min"), mx=("us", "max")
    ).reset_index()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    span = (want["mx"] - want["mn"]).to_numpy()
    assert got["span_us"].tolist() == span.tolist()
    assert got["retained"].tolist() == (span >= RETAIN_US).astype(int).tolist()


def test_user_retention_null_rows_drop(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from kgx.pipelines.relational import user_retention

    tbl = pa.table(
        {"user_id": pa.array([1, None, 1], pa.int64()),
         "ts": pa.array([np.datetime64("2025-01-01", "us"),
                         np.datetime64("2025-01-02", "us"), None])}
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = _collect(user_retention(str(tmp_path)))
    assert got["user_id"].tolist() == [1]
    assert got["n_events"].tolist() == [1]
    assert got["span_us"].tolist() == [0]


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def _serial_winnow(text: str, k: int, w: int) -> set[int]:
    toks = tokenize(text or "")
    hs = [
        stable_hash64(" ".join(toks[i : i + k])) % (1 << 62)
        for i in range(max(len(toks) - k + 1, 0))
    ]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_matches_serial(ray_session):
    import ray.data as rd

    from kgx.stages.corpus import WIN_K, WIN_W, winnow_fingerprints

    rng = np.random.default_rng(41)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab, size=int(m)))
        for m in rng.integers(0, 40, size=200)
    ] + ["", "one", "one two", "one two three", "one two three four"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": texts}
    )
    got = _collect(winnow_fingerprints(rd.from_arrow(tbl).repartition(7)))
    got_map: dict[int, set[int]] = {}
    for r in got.itertuples():
        got_map.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        assert got_map.get(i, set()) == _serial_winnow(t, WIN_K, WIN_W), i


def test_winnow_shared_substring_guarantee(ray_session):
    """Any two docs sharing >= w + k - 1 consecutive tokens share at least
    one fingerprint (the Schleimer et al. winnowing guarantee)."""
    import ray.data as rd

    from kgx.stages.corpus import WIN_K, WIN_W, winnow_fingerprints

    shared = "lorem ipsum dolor sit amet consectetur"  # 6 = w + k - 1
    texts = [
        "aa bb cc " + shared + " dd ee",
        "xx yy " + shared + " zz ww vv uu",
        "totally different words here with nothing in common at all",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    assert WIN_W + WIN_K - 1 <= 6
    got = _collect(winnow_fingerprints(rd.from_arrow(tbl)))
    sets = {
        i: set(got[got["doc_id"] == i]["fp"]) for i in range(len(texts))
    }
    assert sets[0] & sets[1]
    assert not (sets[0] & sets[2])


# ---------------------------------------------------------------------------
# composed curation funnel
# ---------------------------------------------------------------------------


def test_corpus_curate_funnel(ray_session, tmp_path, monkeypatch):
    """Survivors = quality AND lang AND repetition AND cluster
    representative, verified against a serial recomputation of every gate
    on a corpus with planted failures for each."""
    import pyarrow.parquet as pq

    from kgx import queries as Q
    from kgx.functions import textstats as ts

    texts = {
        0: ("the quick brown fox jumps over lazy fences and chases rabbits "
            "through tall autumn grass every morning"),   # survivor
        1: ("copper kettles whistle and steam fills the tiny kitchen while "
            "bread bakes slowly inside brick ovens near winter windows"),  # survivor
        2: "le chat et les chiens est des le les et est des le les",  # non-en
        3: "short",                                       # fails quality
        4: ("the mill wheel turns " * 30).strip(),        # fails repetition
        5: ("granite cliffs tower above the rolling sea and gulls wheel "
            "between salty winds carrying driftwood stories toward distant "
            "harbors"),                                   # survivor
    }
    # 6 duplicates 5 (near-dup cluster; 5 is the min-id representative)
    texts[6] = texts[5]
    ids = sorted(texts)
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "text": [texts[i] for i in ids]}
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = _collect(Q.corpus_curate(str(tmp_path))).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    # serial gates
    surv = []
    for i in ids:
        row = ts.repetition_row(texts[i])
        toks = tokenize(texts[i])
        n_stop = sum(t in ts.QUALITY_STOPWORDS for t in toks)
        q_ok = (
            len(toks) >= ts.QUALITY_MIN_TOKENS
            and len(texts[i]) >= ts.QUALITY_MIN_CHARS
            and ts.QUALITY_STOP_RATIO_DEN * n_stop
            <= ts.QUALITY_STOP_RATIO_NUM * len(toks)
        )
        surv.append((i, q_ok, row["rep_pass"]))
    assert 2 not in got["doc_id"].tolist()   # language gate
    assert 3 not in got["doc_id"].tolist()   # quality gate
    assert 4 not in got["doc_id"].tolist()   # repetition gate
    assert 6 not in got["doc_id"].tolist()   # near-dup of 5, not the rep
    assert {0, 1, 5} <= set(got["doc_id"].tolist())
    # n_tokens matches the tokenizer
    for r in got.itertuples():
        assert r.n_tokens == len(tokenize(texts[r.doc_id]))


# ---------------------------------------------------------------------------
# round-exact k-core
# ---------------------------------------------------------------------------


def _serial_kcore(edges: set[tuple[int, int]], k: int, rounds: int):
    """Synchronous peeling reference: returns {node: core_deg} survivors."""
    sym = edges | {(b, a) for a, b in edges}
    alive = {n for e in sym for n in e}
    for _ in range(rounds):
        deg = {n: 0 for n in alive}
        for a, b in sym:
            if a in alive and b in alive:
                deg[a] += 1
        alive = {n for n in alive if deg[n] >= k}
    return {
        n: sum(1 for a, b in sym if a == n and b in alive) for n in alive
    }


def test_kcore_matches_serial(ray_session):
    import ray.data as rd

    from kgx.stages.graph import kcore_rounds_ds

    rng = np.random.default_rng(7)
    edges = set()
    # clique of 6 (survives k=4) + a chain + random sprinkle (mostly dies)
    for i in range(6):
        for j in range(i + 1, 6):
            edges.add((i, j))
    for i in range(10, 20):
        edges.add((i, i + 1))
    while len(edges) < 60:
        a, b = rng.integers(0, 40, size=2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    sym = list(edges) + [(b, a) for a, b in edges]
    # include duplicate rows: peeling must dedup (COUNT semantics)
    sym = sym + sym[:7]
    tbl = pa.table(
        {"src": pa.array([a for a, _ in sym], pa.int64()),
         "dst": pa.array([b for _, b in sym], pa.int64())}
    )
    for k, rounds in ((4, 4), (2, 3), (1, 2)):
        got = _collect(kcore_rounds_ds(
            rd.from_arrow(tbl).repartition(5), k=k, rounds=rounds
        ))
        want = _serial_kcore(edges, k, rounds)
        assert {r.node: r.core_deg for r in got.itertuples()} == want, (k, rounds)
    # sanity: the 6-clique survives k=4 with core_deg 5
    got = _collect(kcore_rounds_ds(rd.from_arrow(tbl), k=4, rounds=4))
    m = {r.node: r.core_deg for r in got.itertuples()}
    assert all(m.get(i) == 5 for i in range(6))


def test_kcore_empty_survivors(ray_session):
    import ray.data as rd

    from kgx.stages.graph import kcore_rounds_ds

    tbl = pa.table(
        {"src": pa.array([1, 2, 2, 3], pa.int64()),
         "dst": pa.array([2, 1, 3, 2], pa.int64())}
    )
    got = _collect(kcore_rounds_ds(rd.from_arrow(tbl), k=5, rounds=2))
    assert len(got) == 0


# ---------------------------------------------------------------------------
# deterministic shuffle + shard assignment
# ---------------------------------------------------------------------------


def test_doc_shuffle_matches_serial_and_is_stable(ray_session):
    import ray.data as rd

    from kgx.stages.corpus import (
        SAMPLE_ADD,
        SAMPLE_MUL,
        SHUFFLE_SHARDS,
        shuffle_shards,
    )

    ids = np.arange(1000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "text": ["x"] * len(ids)})
    got = _collect(shuffle_shards(rd.from_arrow(tbl).repartition(7)))
    # serial reference
    h = (ids.astype(np.uint64) * np.uint64(SAMPLE_MUL)
         + np.uint64(SAMPLE_ADD))
    shard = ((h >> np.uint64(32)) % np.uint64(SHUFFLE_SHARDS)).astype(np.int64)
    key = (h % np.uint64(1 << 62)).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "shard": shard, "key": key})
    df = df.sort_values(["shard", "key", "doc_id"])
    df["pos"] = df.groupby("shard").cumcount()
    want = df.set_index("doc_id")
    gi = got.set_index("doc_id")
    assert (gi["shard"] == want["shard"].reindex(gi.index)).all()
    assert (gi["pos"] == want["pos"].reindex(gi.index)).all()
    # positions form a dense 0..n_s-1 range per shard
    for s, grp in got.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))
    # shard balance within 3x of uniform on 1000 ids
    sizes = got.groupby("shard").size()
    assert len(sizes) == SHUFFLE_SHARDS
    assert sizes.max() < 3 * sizes.min()
    # growth stability: adding docs never changes existing assignments
    ids2 = np.arange(1500, dtype=np.int64)
    tbl2 = pa.table({"doc_id": pa.array(ids2), "text": ["x"] * len(ids2)})
    got2 = _collect(shuffle_shards(rd.from_arrow(tbl2))).set_index("doc_id")
    assert (got2["shard"].reindex(gi.index) == gi["shard"]).all()


# ---------------------------------------------------------------------------
# product quantization codes
# ---------------------------------------------------------------------------


def test_pq_codes_match_serial(ray_session):
    import ray.data as rd

    from kgx.stages.similarity import PQ_SCALE, pq_codebooks, pq_codes

    rng = np.random.default_rng(13)
    n, d, m, ksub = 400, 16, 4, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {"vec_id": pa.array(range(n), pa.int64()),
         "embedding": pa.array([r.tolist() for r in mat],
                               pa.list_(pa.float32()))}
    )
    sample = tbl.filter(pa.array(np.arange(n) % 10 == 0))
    cb = pq_codebooks(sample, m=m, ksub=ksub)
    assert cb.shape == (m, ksub, d // m)
    got = _collect(pq_codes(rd.from_arrow(tbl).repartition(5), cb))
    q = np.floor(mat.astype(np.float64) * PQ_SCALE + 0.5).astype(np.int64)
    gm = {(r.vec_id, r.sub): r.code for r in got.itertuples()}
    dsub = d // m
    for i in range(n):
        for s in range(m):
            dist = ((q[i, s * dsub:(s + 1) * dsub] - cb[s]) ** 2).sum(axis=1)
            assert gm[(i, s)] == int(dist.argmin()), (i, s)


def test_pq_codebook_wrap_and_null_drop(ray_session):
    import ray.data as rd

    from kgx.stages.similarity import pq_codebooks, pq_codes

    # sample smaller than ksub: the strided index wraps (IVF convention)
    tbl = pa.table(
        {"vec_id": pa.array([0, 1, 2], pa.int64()),
         "embedding": pa.array([[1.0, 2.0], None, [5.0, 6.0]],
                               pa.list_(pa.float32()))}
    )
    cb = pq_codebooks(tbl, m=1, ksub=4)
    assert cb.shape == (1, 4, 2)
    # null row dropped: only rows 0 and 2 alternate under the wrap
    assert cb[0].tolist() == [[1000, 2000], [5000, 6000],
                              [1000, 2000], [5000, 6000]]
    got = _collect(pq_codes(rd.from_arrow(tbl), cb))
    assert sorted(got["vec_id"].unique()) == [0, 2]  # null vec dropped


# ---------------------------------------------------------------------------
# empty-block-safe driver collect (the sf0.001 x 32-CPU rel_anti_join crash)
# ---------------------------------------------------------------------------


def test_collect_arrow_skips_schemaless_empty_blocks(ray_session):
    import ray.data as rd

    from kgx.stages.exchange import collect_arrow

    schema = pa.schema([("o_custkey", pa.int64())])
    good = pa.table({"o_custkey": pa.array([1, 2, 3], pa.int64())})
    # a schema-less empty block like the one an empty map_groups partition
    # emits at high partition counts over tiny inputs
    ds = rd.from_arrow([pa.table({}), good, pa.table({})])
    out = collect_arrow(ds, schema=schema)
    assert out.schema.equals(schema)
    assert out["o_custkey"].to_pylist() == [1, 2, 3]
    # all-empty input falls back to the explicit schema
    out = collect_arrow(rd.from_arrow([pa.table({})]), schema=schema)
    assert out.num_rows == 0 and out.schema.equals(schema)


def test_anti_and_semi_join_survive_high_partition_tiny_input(
    ray_session, tmp_path
):
    """sf0.001-class repro: a tiny distinct-key set under the default 8x-CPU
    partition count leaves most exchange partitions empty; the broadcast
    collect must survive the schema-less empty blocks (crashed r5 pre-fix)."""
    import pyarrow.parquet as pq

    from kgx.pipelines.relational import (
        customers_with_orders,
        customers_without_urgent,
    )

    pq.write_table(
        pa.table({"o_custkey": pa.array([1, 2], pa.int64()),
                  "o_orderpriority": ["1-URGENT", "3-MEDIUM"]}),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
        tmp_path / "customer.parquet",
    )
    anti = _collect(customers_without_urgent(str(tmp_path)))
    assert sorted(anti["c_custkey"]) == [2, 3]
    semi = _collect(customers_with_orders(str(tmp_path)))
    assert sorted(semi["c_custkey"]) == [1, 2]


# ---------------------------------------------------------------------------
# hypothesis properties for the r5 kernels (pure-Python sides — fast)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_tokens = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=0,
    max_size=30,
)


class TestWinnowProperties:
    @given(_tokens, _tokens)
    @settings(max_examples=60, deadline=None)
    def test_shared_run_implies_shared_fp(self, a, b):
        """Schleimer et al. guarantee: docs sharing >= w + k - 1
        consecutive tokens share >= 1 winnow fingerprint (checked on the
        serial kernel the Ray stage is parity-tested against)."""
        from kgx.stages.corpus import WIN_K, WIN_W

        run = ["zz%d" % i for i in range(WIN_W + WIN_K - 1)]
        ta = " ".join(a + run + a)
        tb = " ".join(b + run + b)
        fa = _serial_winnow(ta, WIN_K, WIN_W)
        fb = _serial_winnow(tb, WIN_K, WIN_W)
        assert fa & fb

    @given(_tokens)
    @settings(max_examples=60, deadline=None)
    def test_density_bound(self, toks):
        """Fingerprint count never exceeds the window count (one min per
        window) and is >= 1 whenever any gram exists."""
        from kgx.stages.corpus import WIN_K, WIN_W

        text = " ".join(toks)
        fps = _serial_winnow(text, WIN_K, WIN_W)
        n_grams = max(len(toks) - WIN_K + 1, 0)
        if n_grams == 0:
            assert fps == set()
        else:
            assert 1 <= len(fps) <= max(n_grams - WIN_W + 1, 1)


class TestShuffleShardProperties:
    @given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1,
                   max_size=200))
    @settings(max_examples=40, deadline=None)
    def test_assignment_is_pure_and_dense(self, ids_set):
        from kgx.stages.corpus import (
            SAMPLE_ADD,
            SAMPLE_MUL,
            SHUFFLE_SHARDS,
        )

        ids = np.array(sorted(ids_set), dtype=np.int64)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * np.uint64(SAMPLE_MUL)
                 + np.uint64(SAMPLE_ADD))
        shard = ((h >> np.uint64(32)) % np.uint64(SHUFFLE_SHARDS))
        # pure function of the id: recompute identically
        with np.errstate(over="ignore"):
            h2 = (ids.astype(np.uint64) * np.uint64(SAMPLE_MUL)
                  + np.uint64(SAMPLE_ADD))
        assert (h == h2).all()
        assert (shard < SHUFFLE_SHARDS).all()
