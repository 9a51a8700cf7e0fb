"""Round-5 batch-21 operators: rel_basket_rules (market-basket association
rules with exact integer lift), doc_token_budget (per-source quality-ranked
token-budget selection without a global sort), kg_negative_samples
(deterministic consistent-hashing negatives for KG-embedding training) —
serial-parity + invariant tests."""

from __future__ import annotations

import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# rel_basket_rules
# ---------------------------------------------------------------------------


def test_basket_rules_matches_serial(ray_session):
    from itertools import combinations

    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.pipelines.relational import BASKET_MINSUP

    out = _collect(Q.rel_basket_rules(SF)) \
        .sort_values(["part_a", "part_b"]).reset_index(drop=True)

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    li = li.dropna().drop_duplicates()
    baskets: dict[int, set] = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(int(ok), set()).add(int(pk))
    n_orders = len(baskets)
    part_n: dict[int, int] = {}
    pair_n: dict[tuple, int] = {}
    for parts in baskets.values():
        for p in parts:
            part_n[p] = part_n.get(p, 0) + 1
        for a, b in combinations(sorted(parts), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    rows = []
    for (a, b), n_ab in sorted(pair_n.items()):
        if n_ab < BASKET_MINSUP:
            continue
        na, nb = part_n[a], part_n[b]
        rows.append((a, b, n_ab, na, nb, 10_000 * n_ab * n_orders // (na * nb)))
    ref = pd.DataFrame(rows, columns=["part_a", "part_b", "n_ab", "n_a",
                                      "n_b", "lift_pm"])
    for c in ref.columns:
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0, "minsup must be non-degenerate at sf0.001"


def test_basket_rules_invariants(ray_session):
    import kgx.queries as Q
    from kgx.pipelines.relational import BASKET_MINSUP

    out = _collect(Q.rel_basket_rules(SF))
    assert (out["part_a"] < out["part_b"]).all()
    assert not out.duplicated(["part_a", "part_b"]).any()
    assert (out["n_ab"] >= BASKET_MINSUP).all()
    # a pair can never out-count its marginals
    assert (out["n_ab"] <= out[["n_a", "n_b"]].min(axis=1)).all()
    assert (out["lift_pm"] >= 0).all()


# ---------------------------------------------------------------------------
# doc_token_budget
# ---------------------------------------------------------------------------


def _serial_budget(sf: str, budget: int) -> pd.DataFrame:
    import pyarrow.parquet as pq

    from kgx.functions import textstats as ts

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "source", "text"]).to_pandas()
    docs = docs.dropna(subset=["doc_id", "source"])
    rows = []
    for doc_id, source, text in zip(docs["doc_id"], docs["source"],
                                    docs["text"]):
        q = ts.quality_row(text)
        score = (
            int(q["n_tokens"] >= ts.QUALITY_MIN_TOKENS)
            + int(q["n_chars"] >= ts.QUALITY_MIN_CHARS)
            + int(ts.QUALITY_STOP_RATIO_DEN * q["n_stop"]
                  <= ts.QUALITY_STOP_RATIO_NUM * q["n_tokens"])
        )
        rows.append((int(doc_id), str(source), score, q["n_tokens"]))
    df = pd.DataFrame(rows, columns=["doc_id", "source", "score", "n_tokens"])
    df = df.sort_values(["source", "score", "doc_id"],
                        ascending=[True, False, True], kind="stable")
    df["cum_tokens"] = df.groupby("source", sort=False)["n_tokens"].cumsum()
    df = df[df["cum_tokens"] <= budget]
    for c in ["doc_id", "score", "n_tokens", "cum_tokens"]:
        df[c] = df[c].astype("int64")
    return df.reset_index(drop=True)


def test_token_budget_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.corpus import BUDGET_TOKENS

    out = _collect(Q.doc_token_budget(SF)) \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    ref = _serial_budget(SF, BUDGET_TOKENS) \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "source", "score", "n_tokens", "cum_tokens"]], ref)
    assert len(out) > 0


def test_token_budget_cuts_and_orders(ray_session):
    import kgx.queries as Q
    from kgx.stages.corpus import BUDGET_TOKENS

    out = _collect(Q.doc_token_budget(SF))
    # every source respects the budget
    assert (out.groupby("source")["cum_tokens"].max() <= BUDGET_TOKENS).all()
    # the budget actually cuts (not a pass-through) at sf0.001
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(out) < n_docs
    # within a source, selection = a prefix under (score DESC, doc_id ASC):
    # every kept doc's (score, doc_id) dominates every dropped doc of the
    # same source up to the budget boundary — spot-check via running total
    g = out.sort_values(["source", "score", "doc_id"],
                        ascending=[True, False, True], kind="stable")
    recomputed = g.groupby("source", sort=False)["n_tokens"].cumsum()
    assert (recomputed.to_numpy() == g["cum_tokens"].to_numpy()).all()


def test_token_budget_small_buckets(ray_session):
    """Forcing many tiny buckets exercises the offset/prune machinery."""
    import ray.data as rd

    from kgx.stages.corpus import BUDGET_TOKENS, token_budget

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    out = _collect(token_budget(docs, num_buckets=3)) \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    ref = _serial_budget(SF, BUDGET_TOKENS) \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "source", "score", "n_tokens", "cum_tokens"]], ref)


# ---------------------------------------------------------------------------
# kg_negative_samples
# ---------------------------------------------------------------------------


def _ring_negatives(triples: pd.DataFrame) -> pd.DataFrame:
    """Serial consistent-hashing reference over the deduped triples."""
    from kgx.functions.pipeline_core import normalize_triple_part
    from kgx.functions.text import stable_hash64

    M62 = 1 << 62
    ns = triples["subj"].map(normalize_triple_part)
    no = triples["obj"].map(normalize_triple_part)
    vocab: dict[str, str] = {}
    for key, disp in list(zip(ns, triples["subj"])) + list(
            zip(no, triples["obj"])):
        if key not in vocab or disp < vocab[key]:
            vocab[key] = disp
    ring = sorted((stable_hash64("ent:" + k) % M62, k) for k in vocab)
    rows = []
    for subj, pred, obj, nsk, nok in zip(triples["subj"], triples["pred"],
                                         triples["obj"], ns, no):
        p = stable_hash64("neg:" + nsk + "\x1f" + pred + "\x1f" + nok) % M62
        nxt = next(((h, k) for h, k in ring if h >= p), ring[0])
        if nxt[1] == nok:
            continue
        rows.append((subj, pred, obj, vocab[nxt[1]]))
    return pd.DataFrame(rows, columns=["subj", "pred", "obj", "neg_obj"])


def test_negative_samples_matches_serial(ray_session):
    import kgx.queries as Q

    out = _collect(Q.kg_negative_samples(SF)) \
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    triples = _collect(Q.kg_triples(SF))[["subj", "pred", "obj"]]
    ref = _ring_negatives(triples) \
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0


def test_negative_samples_never_self(ray_session):
    import kgx.queries as Q
    from kgx.functions.pipeline_core import normalize_triple_part

    out = _collect(Q.kg_negative_samples(SF))
    # the filtered-negatives contract: the corrupted object never equals
    # the true object under normalization
    neg = out["neg_obj"].map(normalize_triple_part)
    true = out["obj"].map(normalize_triple_part)
    assert (neg != true).all()
