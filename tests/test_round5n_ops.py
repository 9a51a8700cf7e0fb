"""Round-5 batch-26 operators: kg_pred_paths (directional predicate
composition via middle entities) and kg_pred_object_concentration
(per-predicate object-side selectivity) — serial-parity + invariant tests."""

from __future__ import annotations

import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    if isinstance(ds, pa.Table):
        return ds.to_pandas()
    return ds


# ---------------------------------------------------------------------------
# kg_pred_paths: directional predicate-composition matrix
# ---------------------------------------------------------------------------


def test_pred_paths_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_pred_paths(sf)) \
        .sort_values(["pred_in", "pred_out"]).reset_index(drop=True)

    tri = _collect(Q.kg_triples(sf))
    tri["ns"] = _norm_part_series(tri["subj"])
    tri["no"] = _norm_part_series(tri["obj"])
    t = tri[["ns", "pred", "no"]].drop_duplicates()
    inn = t.groupby(["no", "pred"]).size()
    outt = t.groupby(["ns", "pred"]).size()
    rows: dict[tuple[str, str], int] = {}
    for (m, p1), ci in inn.items():
        for (m2, p2), co in outt.items():
            if m2 == m:
                rows[(p1, p2)] = rows.get((p1, p2), 0) + int(ci) * int(co)
    ref = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(rows.items())],
        columns=["pred_in", "pred_out", "n_paths"])
    ref["n_paths"] = ref["n_paths"].astype("int64")

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    assert (out["n_paths"] >= 1).all()


def test_pred_paths_total_mass(ray_session):
    """Total walk count equals sum over middles of in_deg * out_deg over
    the deduped triple set (mass conservation under the factored count
    product)."""
    import kgx.queries as Q
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_pred_paths(sf))
    tri = _collect(Q.kg_triples(sf))
    tri["ns"] = _norm_part_series(tri["subj"])
    tri["no"] = _norm_part_series(tri["obj"])
    t = tri[["ns", "pred", "no"]].drop_duplicates()
    ind = t.groupby("no").size()
    outd = t.groupby("ns").size()
    both = ind.to_frame("i").join(outd.to_frame("o"), how="inner")
    assert out["n_paths"].sum() == int((both["i"] * both["o"]).sum())


def test_pred_paths_planted():
    """Planted serial check of the walk semantics on a tiny triple set:
    x == y walks and palindromic walks count; dedup collapses repeats."""
    import numpy as np

    # a -p-> b, b -q-> c, b -q-> a, c -r-> c  (plus a duplicate of row 1)
    t = pd.DataFrame(
        {"ns": ["a", "b", "b", "c", "a"],
         "pred": ["p", "q", "q", "r", "p"],
         "no": ["b", "c", "a", "c", "b"]}).drop_duplicates()
    inn = t.groupby(["no", "pred"]).size()
    outt = t.groupby(["ns", "pred"]).size()
    rows: dict[tuple[str, str], int] = {}
    for (m, p1), ci in inn.items():
        for (m2, p2), co in outt.items():
            if m2 == m:
                rows[(p1, p2)] = rows.get((p1, p2), 0) + int(ci) * int(co)
    # middles: b (in p:1; out q:2) -> (p,q)=2 ; c (in q:1, r:1; out r:1)
    # -> (q,r)=1, (r,r)=1 ; a (in q:1; out p:1) -> (q,p)=1
    assert rows == {("p", "q"): 2, ("q", "r"): 1, ("r", "r"): 1,
                    ("q", "p"): 1}
    assert int(np.int64(2)) == 2  # numpy import used


# ---------------------------------------------------------------------------
# kg_pred_object_concentration: per-predicate object selectivity
# ---------------------------------------------------------------------------


def test_pred_object_concentration_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_pred_object_concentration(sf)) \
        .sort_values("pred").reset_index(drop=True)

    tri = _collect(Q.kg_triples(sf))
    tri["ns"] = _norm_part_series(tri["subj"])
    tri["no"] = _norm_part_series(tri["obj"])
    t = tri[["ns", "pred", "no"]].drop_duplicates()
    cnt = t.groupby(["pred", "no"], as_index=False).size() \
        .rename(columns={"size": "c"})
    rows = []
    for pred, g in cnt.groupby("pred"):
        g = g.sort_values(["c", "no"], ascending=[False, True],
                          kind="stable")
        n = int(g["c"].sum())
        rows.append((pred, n, len(g), g.iloc[0]["no"],
                     (10000 * int(g.iloc[0]["c"])) // n))
    ref = pd.DataFrame(
        rows, columns=["pred", "n_triples", "n_distinct_obj", "top_obj",
                       "top_pm"]).sort_values("pred").reset_index(drop=True)
    for c in ("n_triples", "n_distinct_obj", "top_pm"):
        ref[c] = ref[c].astype("int64")

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    assert (out["n_distinct_obj"] <= out["n_triples"]).all()
    assert out["top_pm"].between(1, 10000).all()


def test_pred_object_concentration_argmax_sound(ray_session):
    """Every reported top_obj actually achieves the max per-pred count,
    and is the lexicographic min among ties (mergeable-argmax soundness
    across partition partials)."""
    import kgx.queries as Q
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_pred_object_concentration(sf))
    tri = _collect(Q.kg_triples(sf))
    tri["ns"] = _norm_part_series(tri["subj"])
    tri["no"] = _norm_part_series(tri["obj"])
    t = tri[["ns", "pred", "no"]].drop_duplicates()
    cnt = t.groupby(["pred", "no"]).size()
    for r in out.itertuples():
        per = cnt.loc[r.pred]
        best = per.max()
        winners = sorted(per[per == best].index)
        assert r.top_obj == winners[0]


# ---------------------------------------------------------------------------
# dedup_edit: prefix-edit-distance fuzzy dedup (batch-27)
# ---------------------------------------------------------------------------


def _lev_ref(s, t):
    m, n = len(s), len(t)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev = d[0]
        d[0] = i
        for j in range(1, n + 1):
            cur = min(d[j] + 1, d[j - 1] + 1, prev + (s[i - 1] != t[j - 1]))
            prev = d[j]
            d[j] = cur
    return d[n]


def test_levenshtein_padded_matches_reference():
    """Vectorized prefix-min DP == the classic serial DP on random
    variable-length code pairs (including empty strings)."""
    import random

    import numpy as np

    from kgx.stages.dedup import _levenshtein_padded

    random.seed(7)
    L, P = 24, 400
    A = np.zeros((P, L), dtype=np.int64)
    B = np.zeros((P, L), dtype=np.int64)
    la = np.zeros(P, dtype=np.int64)
    lb = np.zeros(P, dtype=np.int64)
    refs = []
    for i in range(P):
        a = [random.randint(97, 100) for _ in range(random.randint(0, L))]
        b = [random.randint(97, 100) for _ in range(random.randint(0, L))]
        A[i, : len(a)] = a
        B[i, : len(b)] = b
        la[i], lb[i] = len(a), len(b)
        refs.append(_lev_ref(a, b))
    got = _levenshtein_padded(A, la, B, lb)
    assert (got == np.array(refs)).all()


def test_dedup_edit_matches_serial(ray_session):
    """Ray pairs == serial recomputation: minhash-band candidate buckets
    (same certified sig/band builders run serially) verified by the serial
    Levenshtein over normalized prefixes."""
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.functions.text import normalize_ws
    from kgx.stages.dedup import (EDIT_MAX_DIST, EDIT_PREFIX_LEN,
                                  _band_rows_slim, _minhash_sig_rows)

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.dedup_edit(sf)).sort_values(["id_a", "id_b"]) \
        .reset_index(drop=True)

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    sigs = _minhash_sig_rows(docs, 64, 5)
    bands = _band_rows_slim(sigs, 16, 4).to_pandas()
    prefix = {
        int(d): normalize_ws((t or "").lower())[:EDIT_PREFIX_LEN]
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    cands = set()
    for _, g in bands.groupby(["band", "band_hash"]):
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    rows = sorted(
        (a, b) for a, b in cands
        if _lev_ref(prefix[a], prefix[b]) <= EDIT_MAX_DIST)
    ref = pd.DataFrame(rows, columns=["id_a", "id_b"])
    for c in ("id_a", "id_b"):
        ref[c] = ref[c].astype("int64")

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0


def test_edit_prefix_pairs_planted(ray_session):
    """Planted corpus: a doc and its few-char-edit variant (same shingle
    mass -> shared bands) pair up; an unrelated doc does not."""
    import pyarrow as pa
    import ray.data as rd

    from kgx.stages.dedup import edit_prefix_pairs

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight again")
    near = base.replace("quick", "quickk").replace("lazy", "lzy")
    other = ("completely different content about databases and "
             "distributed systems with no shared shingles at all here")
    docs = rd.from_arrow(pa.table(
        {"doc_id": [1, 2, 3], "text": [base, near, other]}))
    pairs = edit_prefix_pairs(docs).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 2) in got
    assert all(3 not in p for p in got)


# ---------------------------------------------------------------------------
# kg_closeness: truncated per-seed closeness components (batch-28)
# ---------------------------------------------------------------------------


def _kg_edges_n(sf: str) -> pd.DataFrame:
    import kgx.queries as Q
    from kgx.functions.text import stable_hash64

    M62 = 1 << 62
    t = _collect(Q.kg_triples(sf))[["subj", "obj"]]
    a = t["subj"].map(lambda s: stable_hash64(s) % M62)
    b = t["obj"].map(lambda s: stable_hash64(s) % M62)
    return pd.DataFrame(
        {"src": pd.concat([a, b], ignore_index=True),
         "dst": pd.concat([b, a], ignore_index=True)}).drop_duplicates()


def test_kg_closeness_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.kg_stages import NF_ROUNDS, NF_SEEDS

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_closeness(sf)) \
        .sort_values("seed").reset_index(drop=True)

    edges = _kg_edges_n(sf)
    adj: dict[int, set] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
    seeds = sorted(adj)[:NF_SEEDS]
    rows = []
    for seed in seeds:
        dist = {seed: 0}
        frontier = [seed]
        for depth in range(1, NF_ROUNDS + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = depth
                        nxt.append(v)
            frontier = nxt
        rows.append((seed, len(dist), sum(dist.values())))
    ref = pd.DataFrame(rows, columns=["seed", "n_reached", "dist_sum"]) \
        .sort_values("seed").reset_index(drop=True).astype("int64")

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    # the seed itself always counts (depth 0) and contributes 0 distance
    assert (out["n_reached"] >= 1).all()
    assert (out["dist_sum"] >= out["n_reached"] - 1).all()


def test_seed_closeness_planted_path(ray_session):
    """Path graph: each seed's dist_sum is the exact sum of hop counts to
    every node within the 4-round horizon."""
    import ray.data as rd

    from kgx.functions.text import stable_hash64
    from kgx.stages.kg_stages import seed_closeness

    names = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    triples = pd.DataFrame(
        {"subj": names[:-1], "pred": ["linked_to"] * 5, "obj": names[1:]})
    out = _collect(seed_closeness(rd.from_pandas(triples), rounds=4,
                                  n_seeds=16)).set_index("seed")
    M62 = 1 << 62
    ids = {n: stable_hash64(n) % M62 for n in names}
    pos = {ids[n]: i for i, n in enumerate(names)}
    for node, i in pos.items():
        dists = [abs(i - j) for j in range(len(names)) if abs(i - j) <= 4]
        assert int(out.loc[node, "n_reached"]) == len(dists)
        assert int(out.loc[node, "dist_sum"]) == sum(dists)


# ---------------------------------------------------------------------------
# emb_matryoshka: truncation-energy histogram (batch-28)
# ---------------------------------------------------------------------------


def test_emb_matryoshka_matches_serial(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.stages.kmeans import KM_SCALE

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.emb_matryoshka(sf)) \
        .sort_values("ratio_pm").reset_index(drop=True)

    tbl = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    mat = np.array(
        [e for e in tbl["embedding"].to_pylist() if e is not None],
        dtype=np.float64)
    q = np.floor(mat * KM_SCALE + 0.5).astype(np.int64)
    sq = q * q
    full = sq.sum(axis=1)
    half = sq[:, : q.shape[1] // 2].sum(axis=1)
    live = full > 0
    ratio = (10000 * half[live]) // full[live]
    b, c = np.unique(ratio, return_counts=True)
    ref = pd.DataFrame({"ratio_pm": b.astype("int64"),
                        "n_vecs": c.astype("int64")})

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    assert out["ratio_pm"].between(0, 10000).all()
    # total mass = number of nonzero vectors
    assert out["n_vecs"].sum() == int(live.sum())


# ---------------------------------------------------------------------------
# kg_walks: deterministic random-walk corpus (batch-29)
# ---------------------------------------------------------------------------


def _serial_walks(edges: pd.DataFrame, walk_len: int) -> pd.DataFrame:
    from kgx.functions.text import stable_hash64

    adj: dict[int, list] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
    rows = []
    for start in sorted(adj):
        cur, steps = start, []
        for t in range(walk_len):
            cur = min(adj[cur],
                      key=lambda v, u=cur, tt=t:
                      (stable_hash64(f"{u}|{tt}|{v}"), v))
            steps.append(cur)
        rows.append((start, *steps))
    return pd.DataFrame(
        rows, columns=["start"] + [f"s{i}" for i in range(1, walk_len + 1)]
    ).astype("int64")


def test_kg_walks_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.kg_stages import WALK_LEN

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_walks(sf)).sort_values("start") \
        .reset_index(drop=True)
    ref = _serial_walks(_kg_edges_n(sf), WALK_LEN)
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0


def test_kg_walks_edges_valid(ray_session):
    """Every consecutive walk hop is an actual symmetric KG edge."""
    import kgx.queries as Q

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_walks(sf))
    eset = set(zip(_kg_edges_n(sf)["src"], _kg_edges_n(sf)["dst"]))
    hops = [("start", "s1"), ("s1", "s2"), ("s2", "s3")]
    for a, b in hops:
        for u, v in zip(out[a], out[b]):
            assert (int(u), int(v)) in eset


def test_entity_walks_planted_path(ray_session):
    """Path graph: interior nodes have exactly two neighbors, so each hop
    is the hash-argmin of the two — checked against the serial walk."""
    import ray.data as rd

    from kgx.stages.kg_stages import entity_walks

    names = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    triples = pd.DataFrame(
        {"subj": names[:-1], "pred": ["linked_to"] * 5, "obj": names[1:]})
    out = _collect(entity_walks(rd.from_pandas(triples), walk_len=3)) \
        .sort_values("start").reset_index(drop=True)
    from kgx.functions.text import stable_hash64
    M62 = 1 << 62
    a = pd.Series(names[:-1]).map(lambda s: stable_hash64(s) % M62)
    b = pd.Series(names[1:]).map(lambda s: stable_hash64(s) % M62)
    edges = pd.DataFrame(
        {"src": pd.concat([a, b], ignore_index=True),
         "dst": pd.concat([b, a], ignore_index=True)})
    ref = _serial_walks(edges, 3)
    pd.testing.assert_frame_equal(out, ref)


# ---------------------------------------------------------------------------
# kg_conf_support: confidence-vs-attestation cross-tab (batch-29)
# ---------------------------------------------------------------------------


def test_kg_conf_support_matches_serial(ray_session):
    import numpy as np

    import kgx.queries as Q

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_conf_support(sf)) \
        .sort_values(["conf_pct", "support_bucket"]).reset_index(drop=True)
    tri = _collect(Q.kg_triples(sf))
    g = pd.DataFrame(
        {"conf_pct": tri["conf_pct"].astype("int64"),
         "support_bucket": np.minimum(tri["n_support"].astype("int64"), 4)})
    ref = g.groupby(["conf_pct", "support_bucket"], as_index=False) \
        .size().rename(columns={"size": "n_triples"}) \
        .sort_values(["conf_pct", "support_bucket"]).reset_index(drop=True)
    ref["n_triples"] = ref["n_triples"].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert out["n_triples"].sum() == len(tri)
    assert out["support_bucket"].between(1, 4).all()


# ---------------------------------------------------------------------------
# kg_split: deterministic 80/10/10 split counts (batch-30)
# ---------------------------------------------------------------------------


def test_kg_split_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.functions.text import stable_hash64
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_split(sf)) \
        .sort_values(["pred", "split"]).reset_index(drop=True)
    tri = _collect(Q.kg_triples(sf))
    tri["ns"] = _norm_part_series(tri["subj"])
    tri["no"] = _norm_part_series(tri["obj"])
    t = tri[["ns", "pred", "no"]].drop_duplicates()
    lab = ["train"] * 8 + ["valid", "test"]
    t = t.assign(split=[
        lab[stable_hash64(f"{a}|{p}|{b}") % 10]
        for a, p, b in zip(t["ns"], t["pred"], t["no"])])
    ref = t.groupby(["pred", "split"], as_index=False).size() \
        .rename(columns={"size": "n_triples"}) \
        .sort_values(["pred", "split"]).reset_index(drop=True)
    ref["n_triples"] = ref["n_triples"].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    # every deduped triple lands in exactly one split
    assert out["n_triples"].sum() == len(t)


# ---------------------------------------------------------------------------
# sketch_f2: exact per-source token frequency moments (batch-30)
# ---------------------------------------------------------------------------


def test_sketch_f2_matches_serial(ray_session):
    from collections import Counter

    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.functions.text import tokenize

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.sketch_f2(sf)).sort_values("source") \
        .reset_index(drop=True)
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    per: dict[str, Counter] = {}
    for src, text in zip(docs["source"], docs["text"]):
        per.setdefault(src, Counter()).update(tokenize(text or ""))
    rows = [(s, len(c), sum(c.values()), sum(v * v for v in c.values()))
            for s, c in sorted(per.items()) if c]
    ref = pd.DataFrame(rows, columns=["source", "f0", "f1", "f2"])
    for col in ("f0", "f1", "f2"):
        ref[col] = ref[col].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    # moment inequalities: F1 >= F0, F2 >= F1, and Cauchy-Schwarz
    assert (out["f1"] >= out["f0"]).all()
    assert (out["f2"] >= out["f1"]).all()
    assert ((out["f1"] ** 2) <= out["f0"] * out["f2"]).all()


# ---------------------------------------------------------------------------
# kg_walk_pairs: skip-gram pairs from the walk corpus (batch-31)
# ---------------------------------------------------------------------------


def test_kg_walk_pairs_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.kg_stages import WALK_LEN

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_walk_pairs(sf)).sort_values(["a", "b"]) \
        .reset_index(drop=True)
    walks = _serial_walks(_kg_edges_n(sf), WALK_LEN)
    cols = ["start"] + [f"s{i}" for i in range(1, WALK_LEN + 1)]
    counts: dict[tuple[int, int], int] = {}
    for row in walks[cols].itertuples(index=False):
        seq = list(row)
        for i in range(len(seq)):
            for j in range(len(seq)):
                if i != j and abs(i - j) <= 2:
                    k = (seq[i], seq[j])
                    counts[k] = counts.get(k, 0) + 1
    ref = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(counts.items())],
        columns=["a", "b", "n_pairs"]).astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    # fixed fan-out: 10 position pairs per 4-node walk
    assert out["n_pairs"].sum() == 10 * len(walks)


# ---------------------------------------------------------------------------
# kg_temporal_conflicts + doc_quality_by_source (batch-32)
# ---------------------------------------------------------------------------


def test_kg_temporal_conflicts_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.pipeline import broadcast_kb, linked_triples_ds
    from kgx.sql_oracles import FUNCTIONAL_PREDS
    from kgx.stages.wide import _norm_part_series
    from kgx.synth import EPOCH_US

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_temporal_conflicts(sf)) \
        .sort_values(["subj", "pred", "day"]).reset_index(drop=True)

    linked = linked_triples_ds(
        Q._kg_sql_pages(sf), Q._kg_sql_cfg(), broadcast_kb()).to_pandas()
    f = linked[linked["pred"].isin(FUNCTIONAL_PREDS)].copy()
    ids = f["url"].str.rsplit("/", n=1).str[-1].astype("int64")
    f["day"] = (EPOCH_US + ids * 37_000_000) // 86_400_000_000
    f["ns"] = _norm_part_series(f["subj"])
    f["no"] = _norm_part_series(f["obj"])
    om = f.groupby(["ns", "pred", "day", "no"], as_index=False).agg(
        subj=("subj", "min"), obj=("obj", "min"))
    rows = []
    for (ns, pred, day), g in om.groupby(["ns", "pred", "day"]):
        if len(g) > 1:
            objs = "|".join(sorted(g["obj"]))
            rows.append((g["subj"].min(), pred, int(day), len(g), objs))
    ref = pd.DataFrame(
        rows, columns=["subj", "pred", "day", "n_objs", "objs"]) \
        .sort_values(["subj", "pred", "day"]).reset_index(drop=True)
    for c in ("day", "n_objs"):
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert (out["n_objs"] >= 2).all()


def test_kg_temporal_conflicts_subset_of_conflicts(ray_session):
    """Every same-day conflicting (subj, pred) also conflicts in the
    day-blind kg_conflicts view (the temporal slice can only REFINE)."""
    import kgx.queries as Q

    sf = "/root/testdata/sf0.001"
    temporal = _collect(Q.kg_temporal_conflicts(sf))
    blind = _collect(Q.kg_conflicts(sf))
    blind_keys = set(zip(blind["subj"], blind["pred"]))
    for s, p in zip(temporal["subj"], temporal["pred"]):
        assert (s, p) in blind_keys


def test_doc_quality_by_source_matches_serial(ray_session):
    import kgx.queries as Q

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.doc_quality_by_source(sf)) \
        .sort_values(["source", "score"]).reset_index(drop=True)
    dup = _collect(Q.doc_quality_dup(sf))
    # mass conservation: per-score doc counts equal the quality_dup
    # cross-tab's score marginals (same certified scoring kernel)
    a = out.groupby("score")["n_docs"].sum()
    b = dup.groupby("score")["n_docs"].sum()
    pd.testing.assert_series_equal(a, b, check_names=False)
    assert out["score"].between(0, 3).all()
    assert (out["n_tokens"] >= 0).all()


# ---------------------------------------------------------------------------
# rel_decile_report + emb_sign_balance (batch-33)
# ---------------------------------------------------------------------------


def test_rel_decile_report_matches_serial(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import kgx.queries as Q

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.rel_decile_report(sf)).sort_values("decile") \
        .reset_index(drop=True)
    o = pq.read_table(f"{sf}/orders.parquet",
                      columns=["o_custkey", "o_totalprice"]).to_pandas() \
        .dropna()
    o["cents"] = np.floor(
        o["o_totalprice"].to_numpy(dtype=np.float64) * 100 + 0.5
    ).astype("int64")
    c = o.groupby("o_custkey", as_index=False).agg(cents=("cents", "sum")) \
        .sort_values(["cents", "o_custkey"]).reset_index(drop=True)
    n = len(c)
    c["decile"] = (np.arange(n, dtype=np.int64) * 10) // n
    ref = c.groupby("decile", as_index=False).agg(
        n_customers=("cents", "size"), revenue_cents=("cents", "sum")) \
        .sort_values("decile").reset_index(drop=True)
    for col in ("n_customers", "revenue_cents"):
        ref[col] = ref[col].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    # decile sizes are floor/ceil of n/10 and revenue is nondecreasing
    assert set(out["decile"]) == set(range(10))
    assert out["n_customers"].sum() == n
    assert out["n_customers"].between(n // 10, n // 10 + 1).all()
    assert (out["revenue_cents"].diff().dropna() >= 0).all()


def test_emb_sign_balance_matches_serial(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.stages.kmeans import KM_SCALE

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.emb_sign_balance(sf)).sort_values("dim") \
        .reset_index(drop=True)
    tbl = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    mat = np.array(
        [e for e in tbl["embedding"].to_pylist() if e is not None],
        dtype=np.float64)
    q = np.floor(mat * KM_SCALE + 0.5).astype(np.int64)
    ref = pd.DataFrame(
        {"dim": np.arange(q.shape[1], dtype="int64"),
         "n_pos": (q > 0).sum(axis=0).astype("int64"),
         "n_zero": (q == 0).sum(axis=0).astype("int64"),
         "n_neg": (q < 0).sum(axis=0).astype("int64")})
    pd.testing.assert_frame_equal(out, ref)
    # sign census partitions every vector at every dimension
    assert ((out["n_pos"] + out["n_zero"] + out["n_neg"])
            == len(mat)).all()


# ---------------------------------------------------------------------------
# kg_inverse_preds: inverse-relation mining (batch-34)
# ---------------------------------------------------------------------------


def test_kg_inverse_preds_empty_on_corpus(ray_session):
    """The synthetic corpus has no cross-pred inverse pairs — the result
    is faithfully empty WITH its typed schema (the 0-row contract the
    driver's column check needs)."""
    import kgx.queries as Q

    out = _collect(Q.kg_inverse_preds("/root/testdata/sf0.001"))
    assert list(out.columns) == ["pred_a", "pred_b", "n_ab", "n_a",
                                 "conf_pm"]
    assert len(out) == 0


def test_inverse_pred_support_planted(ray_session):
    """Planted inverse structure: acquired/subsidiary_of are mutual
    inverses on two entity pairs, a self-loop is its own reverse (p == p
    counts), and a one-directional edge contributes marginals only."""
    import ray.data as rd

    from kgx.stages.kg_stages import inverse_pred_support

    triples = pd.DataFrame(
        {"subj": ["Acme", "Globex", "Initech", "Umbrella", "Hooli",
                  "Hooli", "Acme"],
         "pred": ["acquired", "subsidiary_of", "acquired",
                  "subsidiary_of", "partnered_with", "partnered_with",
                  "acquired"],
         "obj": ["Globex", "Acme", "Umbrella", "Initech", "Hooli",
                 "Vandelay", "Stark"]})
    out = _collect(inverse_pred_support(rd.from_pandas(triples))) \
        .sort_values(["pred_a", "pred_b"]).reset_index(drop=True)

    # serial reference via the reverse self-join over the deduped set
    t = triples.copy()
    t["ns"] = t["subj"].str.lower()
    t["no"] = t["obj"].str.lower()
    t = t[["ns", "pred", "no"]].drop_duplicates()
    m = t.merge(
        t.rename(columns={"ns": "no", "no": "ns", "pred": "pred_b"}),
        on=["ns", "no"])
    ab = m.groupby(["pred", "pred_b"], as_index=False).size() \
        .rename(columns={"pred": "pred_a", "size": "n_ab"})
    na = t.groupby("pred", as_index=False).size() \
        .rename(columns={"pred": "pred_a", "size": "n_a"})
    ref = ab.merge(na, on="pred_a")
    ref["conf_pm"] = (10000 * ref["n_ab"]) // ref["n_a"]
    ref = ref.sort_values(["pred_a", "pred_b"]).reset_index(drop=True)
    for c in ("n_ab", "n_a", "conf_pm"):
        ref[c] = ref[c].astype("int64")

    pd.testing.assert_frame_equal(out, ref)
    got = {(r.pred_a, r.pred_b): r.n_ab for r in out.itertuples()}
    # acquired <-> subsidiary_of on two pairs, both directions
    assert got[("acquired", "subsidiary_of")] == 2
    assert got[("subsidiary_of", "acquired")] == 2
    # Hooli's self-loop is its own reverse
    assert got[("partnered_with", "partnered_with")] == 1
    # one-directional acquired(Acme, Stark) inflates n_a but not n_ab
    row = out[(out["pred_a"] == "acquired")
              & (out["pred_b"] == "subsidiary_of")].iloc[0]
    assert row["n_a"] == 3 and row["conf_pm"] == 6666


# ---------------------------------------------------------------------------
# doc_dup_by_source: per-source exact-duplication impact (batch-35)
# ---------------------------------------------------------------------------


def test_doc_dup_by_source_matches_serial(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.functions.text import md5_fingerprint

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.doc_dup_by_source(sf)).sort_values("source") \
        .reset_index(drop=True)
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text", "source"]).to_pandas() \
        .dropna(subset=["doc_id"])
    docs["fp"] = docs["text"].fillna("").map(md5_fingerprint)
    sizes = docs.groupby("fp")["fp"].transform("size")
    docs["dup"] = (sizes > 1).astype("int64")
    ref = docs.groupby("source", as_index=False).agg(
        n_docs=("dup", "size"), n_dup_docs=("dup", "sum"),
        n_distinct_fps=("fp", "nunique")) \
        .sort_values("source").reset_index(drop=True)
    for c in ("n_docs", "n_dup_docs", "n_distinct_fps"):
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert (out["n_dup_docs"] <= out["n_docs"]).all()
    assert (out["n_distinct_fps"] <= out["n_docs"]).all()


def test_dup_by_source_planted(ray_session):
    """Planted cross-source duplicate: the same text in two sources marks
    BOTH copies duplicated (corpus-wide flag), each source still credits
    one distinct fingerprint."""
    import pyarrow as pa
    import ray.data as rd

    from kgx.stages.corpus import dup_by_source

    docs = rd.from_arrow(pa.table(
        {"doc_id": [1, 2, 3],
         "text": ["same text here", "same text here", "unique text"],
         "source": ["s1", "s2", "s2"]}))
    out = _collect(dup_by_source(docs)).set_index("source")
    assert int(out.loc["s1", "n_dup_docs"]) == 1
    assert int(out.loc["s2", "n_dup_docs"]) == 1
    assert int(out.loc["s2", "n_docs"]) == 2
    assert int(out.loc["s1", "n_distinct_fps"]) == 1
    assert int(out.loc["s2", "n_distinct_fps"]) == 2
