"""Round-5 batch-26 operators: kg_pred_paths (directional predicate
composition via middle entities) and kg_pred_object_concentration
(per-predicate object-side selectivity) — serial-parity + invariant tests."""

from __future__ import annotations

import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
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
