"""Round-5 batch-20 operators: text_vocab_overlap (per-source-pair
vocabulary Jaccard), rel_event_transitions (per-user event-type Markov
matrix), kg_seg_yield (extraction yield by segment ordinal) —
serial-parity + invariant tests."""

from __future__ import annotations

import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


# ---------------------------------------------------------------------------
# text_vocab_overlap: per-source-pair vocabulary Jaccard
# ---------------------------------------------------------------------------


def test_vocab_overlap_matches_serial(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.functions.text import tokenize

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.text_vocab_overlap(sf)) \
        .sort_values(["src_a", "src_b"]).reset_index(drop=True)

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    vocab: dict[str, set] = {}
    for src, text in zip(docs["source"], docs["text"]):
        if src is None:
            continue
        vocab.setdefault(src, set()).update(tokenize(text or ""))
    rows = []
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            common = len(vocab[a] & vocab[b])
            if not common:
                continue
            na, nb = len(vocab[a]), len(vocab[b])
            rows.append((a, b, common, na, nb,
                         10_000 * common // (na + nb - common)))
    ref = pd.DataFrame(rows, columns=["src_a", "src_b", "n_common", "n_a",
                                      "n_b", "jaccard_pm"])
    for c in ["n_common", "n_a", "n_b", "jaccard_pm"]:
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0


def test_vocab_overlap_jaccard_bounds(ray_session):
    import kgx.queries as Q

    out = _collect(Q.text_vocab_overlap("/root/testdata/sf0.001"))
    assert (out["jaccard_pm"] >= 0).all() and (out["jaccard_pm"] <= 10_000).all()
    # intersection can never exceed either side
    assert (out["n_common"] <= out[["n_a", "n_b"]].min(axis=1)).all()
    # pairs are canonically ordered and unique
    assert (out["src_a"] < out["src_b"]).all()
    assert not out.duplicated(["src_a", "src_b"]).any()


# ---------------------------------------------------------------------------
# rel_event_transitions: per-user consecutive event-type pairs
# ---------------------------------------------------------------------------


def test_event_transitions_matches_serial(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.rel_event_transitions(sf)) \
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True)

    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]).to_pandas()
    ev = ev.dropna(subset=["ts", "user_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    users = ev["user_id"].to_numpy()
    types = ev["event_type"].to_numpy()
    same = users[1:] == users[:-1]
    ref = (
        pd.DataFrame({"prev_type": types[:-1][same],
                      "next_type": types[1:][same]})
        .groupby(["prev_type", "next_type"], as_index=False)
        .size().rename(columns={"size": "n_pairs"})
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    ref["n_pairs"] = ref["n_pairs"].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0


def test_event_transitions_mass_conservation(ray_session):
    """Total transition count == total events minus distinct users (each
    user contributes len(events)-1 adjacent pairs)."""
    import pyarrow.parquet as pq

    import kgx.queries as Q

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.rel_event_transitions(sf))
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["ts", "user_id", "event_type"]).to_pandas()
    ev = ev.dropna(subset=["ts", "user_id", "event_type"])
    expected = len(ev) - ev["user_id"].nunique()
    assert int(out["n_pairs"].sum()) == expected


# ---------------------------------------------------------------------------
# kg_seg_yield: extraction yield by segment ordinal
# ---------------------------------------------------------------------------


def test_kg_seg_yield_matches_chain(ray_session):
    """Per-ordinal totals must re-derive from the mention / triple / segment
    streams the operator composes."""
    import kgx.queries as Q
    from kgx.pipeline import segments_ds

    sf = "/root/testdata/sf0.001"
    out = _collect(Q.kg_seg_yield(sf)).sort_values("seg_id") \
        .reset_index(drop=True)

    segs = segments_ds(Q._kg_sql_pages(sf), Q._kg_sql_cfg()).to_pandas()
    men = _collect(Q.kg_mentions(sf))
    tri = _collect(Q.kg_triples(sf))

    seg_counts = segs.groupby("seg_id").size()
    men_counts = men.groupby("seg_id").size()
    assert out["seg_id"].tolist() == sorted(seg_counts.index.astype(int))
    for _, r in out.iterrows():
        assert r["n_segments"] == int(seg_counts.get(r["seg_id"], 0))
        assert r["n_mentions"] == int(men_counts.get(r["seg_id"], 0))
    # triples conserve mass: dedup collapses rows, but the PRE-dedup linked
    # stream is what kg_seg_yield counts — check it sums to >= the deduped
    # triple support total and > 0
    assert int(out["n_triples"].sum()) >= len(tri)
    assert int(out["n_triples"].sum()) == int(tri["n_support"].sum())
