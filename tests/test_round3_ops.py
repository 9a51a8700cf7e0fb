"""Round-3 new operators: integer PageRank, tf-idf top-k, inverted index,
event funnel, grouped quantiles — each property-tested against a serial
brute force here; the DuckDB SQL oracle is the driver's second gate
(scripts/check_queries.py covers all five at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _collect(ds):
    parts = [
        b.to_pandas()
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    return (
        pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
    )


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _serial_pagerank(edges: list[tuple[int, int]], iterations: int):
    from kgx.stages.graph import BASE, DAMP_DEN, DAMP_NUM, R0

    nodes = sorted({n for e in edges for n in e})
    outdeg = {n: 0 for n in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    r = {n: R0 for n in nodes}
    for _ in range(iterations):
        nxt = {n: BASE for n in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * DAMP_NUM) // (DAMP_DEN * outdeg[s])
        r = nxt
    return r


def test_pagerank_matches_serial_on_random_graph(ray_session):
    import ray.data as rd

    from kgx.stages.graph import pagerank_ds

    rng = np.random.default_rng(7)
    raw = {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(300, 2))
           if a != b}
    edges = sorted(raw | {(b, a) for a, b in raw})  # symmetrize
    ds = rd.from_arrow(
        pa.table(
            {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]},
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        )
    )
    got = _collect(pagerank_ds(ds, iterations=3)).set_index("node")["pr"].to_dict()
    want = _serial_pagerank(edges, 3)
    assert got == want


def test_pagerank_dedups_input_edges(ray_session):
    """Duplicate edge rows must not double a contribution."""
    import ray.data as rd

    from kgx.stages.graph import pagerank_ds

    edges = [(0, 1), (1, 0)]
    dup = edges * 5
    ds = rd.from_arrow(
        pa.table(
            {"src": [e[0] for e in dup], "dst": [e[1] for e in dup]},
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        )
    )
    got = _collect(pagerank_ds(ds, iterations=2)).set_index("node")["pr"].to_dict()
    assert got == _serial_pagerank(edges, 2)


def test_pagerank_mass_bounded(ray_session):
    """Total integer mass never exceeds the initial mass (floor division
    only loses mass), so int64 cannot overflow at any corpus size."""
    from kgx.queries import graph_pagerank
    from kgx.stages.graph import R0

    out = _collect(graph_pagerank(SF))
    assert out["pr"].sum() <= R0 * len(out)
    assert (out["pr"] > 0).all()


def test_pagerank_contrib_identity_near_int64_bound():
    """The divide-first contribution rewrite equals the naive
    (pr * DAMP_NUM) // den under Python big ints for hub ranks where the
    naive int64 product would wrap (pr up to total-mass-at-9e9-nodes)."""
    from kgx.stages.graph import DAMP_DEN, DAMP_NUM

    prs = np.array(
        [10**9, 123_456_789_012, 10**17 + 7, 9 * 10**18 // 1, 2**62 + 3],
        dtype=np.int64,
    )
    outdegs = np.array([1, 3, 7, 1000, 2], dtype=np.int64)
    for pr in prs:
        for od in outdegs:
            den = DAMP_DEN * od
            q, r = np.divmod(pr, den)
            got = int(q) * DAMP_NUM + (int(r) * DAMP_NUM) // int(den)
            want = (int(pr) * DAMP_NUM) // int(den)  # big-int truth
            assert got == want, (pr, od)


# ---------------------------------------------------------------------------
# tf-idf / inverted index
# ---------------------------------------------------------------------------


def _docs_table():
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cats and dogs and cats",
        "",
        "unique snowflake token",
        "the the the the",
    ]
    return pa.table(
        {"doc_id": list(range(len(texts))), "text": texts},
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )


def test_tfidf_matches_serial(ray_session):
    import ray.data as rd

    from kgx.functions.text import tokenize
    from kgx.stages.corpus import IDF_SCALE, tfidf_topk

    t = _docs_table()
    n_docs = t.num_rows
    got = _collect(tfidf_topk(rd.from_arrow(t), n_docs, k=2))

    tf: dict[tuple[int, str], int] = {}
    df: dict[str, int] = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        counts: dict[str, int] = {}
        for tok in tokenize(text):
            counts[tok] = counts.get(tok, 0) + 1
        for tok, c in counts.items():
            tf[(doc_id, tok)] = c
            df[tok] = df.get(tok, 0) + 1
    rows = [
        (d, tok, c * ((n_docs * IDF_SCALE) // df[tok]))
        for (d, tok), c in tf.items()
    ]
    want = []
    for d in sorted({r[0] for r in rows}):
        cand = sorted(
            [r for r in rows if r[0] == d], key=lambda r: (-r[2], r[1])
        )[:2]
        want.extend(
            (d, tok, score, i + 1) for i, (_, tok, score) in enumerate(cand)
        )
    got_set = set(map(tuple, got[["doc_id", "token", "score", "rank"]].values))
    assert got_set == set(want)


def test_inverted_index_matches_serial(ray_session):
    import ray.data as rd

    from kgx.functions.text import tokenize
    from kgx.stages.corpus import inverted_index

    t = _docs_table()
    got = _collect(inverted_index(rd.from_arrow(t), postings_k=2))

    postings: dict[str, list[int]] = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for tok in set(tokenize(text)):
            postings.setdefault(tok, []).append(doc_id)
    want = set()
    for tok, docs in postings.items():
        for i, d in enumerate(sorted(docs)[:2]):
            want.add((tok, len(docs), d, i + 1))
    got_set = set(
        map(tuple, got[["token", "df", "doc_id", "posting_rank"]].values)
    )
    assert got_set == want


def test_inverted_index_combiner_bound(ray_session):
    """Tiny batches (forcing many combiners) must not change the result —
    the min-k posting combiner is associative."""
    import ray.data as rd

    from kgx.stages.corpus import inverted_index

    t = _docs_table()
    one = _collect(inverted_index(rd.from_arrow(t), postings_k=2))
    shredded = rd.from_arrow(t).repartition(6)
    many = _collect(inverted_index(shredded, postings_k=2))
    key = ["token", "doc_id"]
    pd.testing.assert_frame_equal(
        one.sort_values(key).reset_index(drop=True),
        many.sort_values(key).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# funnel / quantiles
# ---------------------------------------------------------------------------


def test_event_funnel_matches_serial(ray_session):
    from kgx.pipelines.relational import event_funnel

    got = (
        _collect(event_funnel(SF))
        .set_index("user_id")[["n_a", "n_converted"]]
        .to_dict("index")
    )

    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    window_us = 30 * 60 * 1_000_000
    want: dict[int, dict[str, int]] = {}
    for uid, g in ev.groupby("user_id"):
        us = g["ts"].astype("datetime64[us]").astype("int64")
        a_ts = sorted(us[g["event_type"] == "click"])
        b_ts = sorted(us[g["event_type"] == "purchase"])
        if not a_ts:
            continue
        conv = sum(
            1 for t in a_ts if any(t < b <= t + window_us for b in b_ts)
        )
        want[uid] = {"n_a": len(a_ts), "n_converted": conv}
    assert got == want


def test_grouped_quantiles_matches_serial(ray_session):
    from kgx.pipelines.relational import quantile_orders_per_nation

    got = (
        _collect(quantile_orders_per_nation(SF))
        .set_index("c_nationkey")
        .to_dict("index")
    )

    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    cust = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    counts = orders.groupby("o_custkey").size().rename("cnt").reset_index()
    j = counts.merge(cust, left_on="o_custkey", right_on="c_custkey")
    want = {}
    for nat, g in j.groupby("c_nationkey"):
        v = sorted(g["cnt"])
        want[nat] = {
            f"p{q}": v[(len(v) - 1) * q // 100] for q in (25, 50, 75)
        }
    assert got == want
