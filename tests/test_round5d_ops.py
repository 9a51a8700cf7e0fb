"""Round-5 batch-7 operators: embedding-norm histogram (+ the batch's
later additions) — serial-parity + hostile-input tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


# ---------------------------------------------------------------------------
# embedding-norm histogram
# ---------------------------------------------------------------------------


def test_norm_hist_matches_serial(ray_session):
    import ray.data as rd

    from kgx.stages.kmeans import KM_SCALE, norm_histogram

    rng = np.random.default_rng(11)
    vecs = (rng.standard_normal((60, 6)) * 0.5).astype(np.float32)
    tbl = pa.table(
        {"vec_id": np.arange(60, dtype=np.int64),
         "embedding": pa.array(list(vecs), pa.list_(pa.float32()))}
    )
    bucket = 100_000
    out = _collect(
        norm_histogram(rd.from_arrow(tbl).repartition(7), bucket=bucket))
    q = np.floor(vecs.astype(np.float64) * KM_SCALE + 0.5).astype(np.int64)
    norm2 = (q * q).sum(axis=1)
    b, cnt = np.unique(norm2 // bucket, return_counts=True)
    got = dict(zip(out["bucket"], out["n_vecs"]))
    assert got == {int(k): int(v) for k, v in zip(b, cnt)}
    assert int(out["n_vecs"].sum()) == 60  # total mass = row count


def test_norm_hist_null_and_zero_vectors(ray_session):
    import ray.data as rd

    from kgx.stages.kmeans import norm_histogram

    vecs = [[0.0, 0.0], None, [1.0, 0.0], [0.6, 0.8]]
    tbl = pa.table(
        {"vec_id": pa.array([0, 1, 2, 3], pa.int64()),
         "embedding": pa.array(vecs, pa.list_(pa.float32()))}
    )
    out = _collect(norm_histogram(rd.from_arrow(tbl), bucket=1_000_000))
    got = dict(zip(out["bucket"], out["n_vecs"]))
    # zero vector -> bucket 0; unit vectors 1e6 -> bucket 1; null drops
    assert got == {0: 1, 1: 2}
