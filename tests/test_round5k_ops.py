"""Round-5 batch-23 operators: kg_neighborhood_function (ANF /
effective-diameter curve via nibble-packed multi-seed BFS) and
rel_conversion_lag (activation-time histogram) — serial-parity +
invariant tests."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    if isinstance(ds, pa.Table):
        return ds.to_pandas()
    return ds


SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# kg_neighborhood_function
# ---------------------------------------------------------------------------


def _kg_edges(sf: str) -> pd.DataFrame:
    import kgx.queries as Q
    from kgx.functions.text import stable_hash64

    M62 = 1 << 62
    t = _collect(Q.kg_triples(sf))[["subj", "obj"]]
    a = t["subj"].map(lambda s: stable_hash64(s) % M62)
    b = t["obj"].map(lambda s: stable_hash64(s) % M62)
    e = pd.DataFrame({"src": pd.concat([a, b], ignore_index=True),
                      "dst": pd.concat([b, a], ignore_index=True)})
    return e.drop_duplicates()


def _serial_nf(edges: pd.DataFrame, n_seeds: int, rounds: int):
    adj: dict[int, set] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
    seeds = sorted(adj)[:n_seeds]
    hist: dict[int, int] = {}
    for seed in seeds:
        dist = {seed: 0}
        frontier = [seed]
        for depth in range(1, rounds + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = depth
                        nxt.append(v)
            frontier = nxt
        for d in dist.values():
            hist[d] = hist.get(d, 0) + 1
    return pd.DataFrame(sorted(hist.items()), columns=["depth", "n_pairs"]) \
        .astype("int64")


def test_neighborhood_function_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.stages.kg_stages import NF_ROUNDS, NF_SEEDS

    out = _collect(Q.kg_neighborhood_function(SF)) \
        .sort_values("depth").reset_index(drop=True)
    ref = _serial_nf(_kg_edges(SF), NF_SEEDS, NF_ROUNDS)
    pd.testing.assert_frame_equal(out, ref)
    # depth 0 row counts exactly the seeds
    assert int(out.loc[out["depth"] == 0, "n_pairs"].iloc[0]) \
        == min(NF_SEEDS, len(set(_kg_edges(SF)["src"])))


def test_neighborhood_function_monotone_ball(ray_session):
    """The cumulative neighborhood function N(h) must be nondecreasing and
    bounded by seeds x nodes."""
    import kgx.queries as Q
    from kgx.stages.kg_stages import NF_SEEDS

    out = _collect(Q.kg_neighborhood_function(SF)).sort_values("depth")
    cum = out["n_pairs"].cumsum().to_numpy()
    assert (np.diff(cum) >= 0).all()
    n_nodes = len(set(_kg_edges(SF)["src"]))
    assert cum[-1] <= NF_SEEDS * n_nodes


def test_neighborhood_function_planted_path(ray_session):
    """A planted path graph has exactly one new node per depth per seed
    within range — checked through the packed-nibble Pregel directly."""
    import pandas as pd
    import ray.data as rd

    from kgx.stages.kg_stages import neighborhood_function

    # path A-B-C-D-E-F as triples; seeds = 16 smallest hashed ids
    names = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    triples = pd.DataFrame(
        {"subj": names[:-1], "pred": ["linked_to"] * 5, "obj": names[1:]})
    out = _collect(
        neighborhood_function(rd.from_pandas(triples), rounds=4, n_seeds=16)
    ).sort_values("depth").reset_index(drop=True)
    edges = pd.DataFrame({"src": names[:-1], "dst": names[1:]})
    from kgx.functions.text import stable_hash64

    M62 = 1 << 62
    e = pd.DataFrame(
        {"src": pd.concat([edges["src"].map(lambda s: stable_hash64(s) % M62),
                           edges["dst"].map(lambda s: stable_hash64(s) % M62)],
                          ignore_index=True),
         "dst": pd.concat([edges["dst"].map(lambda s: stable_hash64(s) % M62),
                           edges["src"].map(lambda s: stable_hash64(s) % M62)],
                          ignore_index=True)})
    ref = _serial_nf(e, 16, 4)
    pd.testing.assert_frame_equal(out, ref)


# ---------------------------------------------------------------------------
# rel_conversion_lag
# ---------------------------------------------------------------------------


def test_conversion_lag_matches_serial(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.pipelines.relational import LAG_BUCKET_US, LAG_FROM, LAG_TO

    out = _collect(Q.rel_conversion_lag(SF)) \
        .sort_values("lag_hours").reset_index(drop=True)

    e = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts", "event_type"]).to_pandas()
    e = e.dropna()
    e["us"] = (pd.to_datetime(e["ts"]).astype("datetime64[us]")
               .astype("int64"))
    hist: dict[int, int] = {}
    for u, g in e.groupby("user_id"):
        fr = g.loc[g["event_type"] == LAG_FROM, "us"]
        if not len(fr):
            continue
        f = int(fr.min())
        to = g.loc[(g["event_type"] == LAG_TO) & (g["us"] >= f), "us"]
        if not len(to):
            continue
        lag = (int(to.min()) - f) // LAG_BUCKET_US
        hist[lag] = hist.get(lag, 0) + 1
    ref = pd.DataFrame(sorted(hist.items()),
                       columns=["lag_hours", "n_users"]).astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0


def test_conversion_lag_planted_hidden_candidate(ray_session):
    """The non-mergeable trap: a user whose earliest purchase precedes
    signup must convert at the LATER purchase, even when the early one is
    the batch minimum."""
    import pandas as pd
    import ray.data as rd

    from kgx.pipelines.relational import conversion_lag

    # build a tiny events frame and run the stage over it via a temp dir
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile
    from pathlib import Path

    rows = pd.DataFrame(
        {"user_id": [1, 1, 1, 2, 2],
         "ts": pd.to_datetime(
             ["2026-01-01 00:00", "2026-01-02 00:00", "2026-01-02 05:30",
              "2026-01-01 00:00", "2026-01-01 00:00"]),
         "event_type": ["purchase", "signup", "purchase",
                        "signup", "purchase"]})
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.Table.from_pandas(rows),
                       str(Path(td) / "events.parquet"))
        out = _collect(conversion_lag(td)).sort_values("lag_hours") \
            .reset_index(drop=True)
    # user 1: signup 01-02 00:00 -> purchase 01-02 05:30 = 5h (the 01-01
    # purchase is earlier but before signup); user 2: 0h
    ref = pd.DataFrame({"lag_hours": [0, 5], "n_users": [1, 1]}) \
        .astype("int64")
    pd.testing.assert_frame_equal(out, ref)
