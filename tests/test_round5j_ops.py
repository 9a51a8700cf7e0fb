"""Round-5 batch-22 operators: emb_quantize_error (SQ8 reconstruction-error
profile), emb_centroid_drift (A/B per-label centroid drift), rel_rfm_segments
(RFM customer-segmentation histogram) — serial-parity + invariant tests."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


SF = "/root/testdata/sf0.001"


def _qmat(sf: str):
    import pyarrow.parquet as pq

    from kgx.stages.kmeans import KM_SCALE

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "label", "embedding"])
    df = t.to_pandas()
    df = df[df["embedding"].notna()]
    mat = np.stack(df["embedding"].to_numpy())
    q = np.floor(mat.astype(np.float64) * KM_SCALE + 0.5).astype(np.int64)
    return (df["vec_id"].to_numpy().astype(np.int64),
            df["label"].to_numpy().astype(np.int64), q)


# ---------------------------------------------------------------------------
# emb_quantize_error
# ---------------------------------------------------------------------------


def test_quantize_error_matches_serial(ray_session):
    import kgx.queries as Q

    out = _collect(Q.emb_quantize_error(SF)) \
        .sort_values("dim").reset_index(drop=True)
    _, _, q = _qmat(SF)
    minq = q.min(axis=0)
    span = np.maximum(q.max(axis=0) - minq, 1)
    codes = (q - minq) * 255 // span
    recon = minq + codes * span // 255
    err = q - recon
    ref = pd.DataFrame(
        {"dim": np.arange(q.shape[1], dtype=np.int64),
         "n": np.full(q.shape[1], q.shape[0], dtype=np.int64),
         "sum_err_q": err.sum(axis=0),
         "max_err_q": err.max(axis=0)})
    pd.testing.assert_frame_equal(out, ref)
    # reconstruction never overshoots and error is span-bounded
    assert (err >= 0).all()
    assert (out["max_err_q"].to_numpy() <= np.ceil(span / 255)).all()


# ---------------------------------------------------------------------------
# emb_centroid_drift
# ---------------------------------------------------------------------------


def test_centroid_drift_matches_serial(ray_session):
    import kgx.queries as Q

    out = _collect(Q.emb_centroid_drift(SF)) \
        .sort_values("label").reset_index(drop=True)
    ids, labels, q = _qmat(SF)
    rows = []
    for lab in np.unique(labels):
        a = q[(labels == lab) & (ids % 2 == 0)]
        b = q[(labels == lab) & (ids % 2 == 1)]
        if not len(a) or not len(b):
            continue
        sa = a.sum(axis=0)
        sb = b.sum(axis=0)
        rows.append((int(lab), len(a), len(b),
                     int((sa * sb).sum()), int((sa * sa).sum()),
                     int((sb * sb).sum())))
    ref = pd.DataFrame(rows, columns=["label", "n_a", "n_b", "dot_q",
                                      "na2_q", "nb2_q"])
    for c in ref.columns:
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0
    # cauchy-schwarz: the drift cosine is well-defined and in [-1, 1]
    cos = out["dot_q"] / np.sqrt(out["na2_q"].astype(float)
                                 * out["nb2_q"].astype(float))
    assert (np.abs(cos) <= 1.0 + 1e-12).all()


def test_centroid_drift_counts_partition_invariant(ray_session):
    """n_a/n_b must not depend on how many dims a partition holds (the
    repeated-per-dim count partials sum over ONE resident dim only)."""
    import ray.data as rd

    from kgx.stages.kmeans import centroid_drift

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
    out = _collect(centroid_drift(ds))
    ids, labels, q = _qmat(SF)
    for _, row in out.iterrows():
        lab = row["label"]
        assert row["n_a"] == int(((labels == lab) & (ids % 2 == 0)).sum())
        assert row["n_b"] == int(((labels == lab) & (ids % 2 == 1)).sum())


# ---------------------------------------------------------------------------
# rel_rfm_segments
# ---------------------------------------------------------------------------


def test_rfm_matches_serial(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q
    from kgx.pipelines.relational import (RFM_F_ORDERS, RFM_M_CENTS,
                                          RFM_R_DAYS)

    out = _collect(Q.rel_rfm_segments(SF)) \
        .sort_values(["r", "f", "m"]).reset_index(drop=True)

    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_custkey", "o_orderdate",
                               "o_totalprice"]).to_pandas()
    o = o.dropna()
    day = (pd.to_datetime(o["o_orderdate"]).astype("datetime64[us]")
           .astype("int64") // 86_400_000_000)
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    g = pd.DataFrame({"c": o["o_custkey"].to_numpy(), "day": day.to_numpy(),
                      "cents": cents}).groupby("c").agg(
        md=("day", "max"), n=("day", "size"), tc=("cents", "sum"))
    gd = int(day.max())

    def tier(v, t):
        return int(np.searchsorted(np.asarray(t), v, side="right"))

    cells: dict[tuple, int] = {}
    for _, row in g.iterrows():
        key = (tier(gd - row["md"], RFM_R_DAYS), tier(row["n"], RFM_F_ORDERS),
               tier(row["tc"], RFM_M_CENTS))
        cells[key] = cells.get(key, 0) + 1
    ref = pd.DataFrame(
        [(r, f, m, n) for (r, f, m), n in sorted(cells.items())],
        columns=["r", "f", "m", "n_customers"])
    for c in ref.columns:
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)


def test_rfm_mass_and_bounds(ray_session):
    import pyarrow.parquet as pq

    import kgx.queries as Q

    out = _collect(Q.rel_rfm_segments(SF))
    # every tier in range, cells unique, mass = distinct customers
    for c in ("r", "f", "m"):
        assert out[c].between(0, 3).all()
    assert not out.duplicated(["r", "f", "m"]).any()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_custkey"]).to_pandas().dropna()
    assert out["n_customers"].sum() == o["o_custkey"].nunique()
    # the quartile anchoring keeps more than one tier populated per axis
    assert out["r"].nunique() > 1 and out["f"].nunique() > 1 \
        and out["m"].nunique() > 1
