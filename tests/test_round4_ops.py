"""Round-4 operators: mergeable histogram quantile sketch, PMI
collocations, k-means over embeddings — property-tested against serial
brute force (the driver's SQL oracle is the other gate;
scripts/check_queries.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kgx.stages.sketch import QUANT_BIN_W, quantile_histogram


def _collect(ds):
    frames = [
        b.to_pandas()
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    return (
        pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    )


# ---------------------------------------------------------------------------
# quantile histogram sketch
# ---------------------------------------------------------------------------


def _serial_quantile_hist(prices, bin_w, ps):
    cents = np.floor(np.asarray(prices) * 100.0 + 0.5).astype(np.int64)
    bins, cnt = np.unique(cents // bin_w, return_counts=True)
    cum = cnt.cumsum()
    n = int(cum[-1])
    out = {}
    for p in ps:
        target = (n * p + 99) // 100
        i = int(np.searchsorted(cum, target, side="left"))
        out[p] = int(bins[i]) * bin_w + bin_w // 2
    return out


def test_quantile_histogram_matches_serial_and_bounds_error(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    prices = np.round(rng.lognormal(7.0, 1.0, size=20_000), 2)
    ds = rd.from_arrow(pa.table({"l_extendedprice": prices})).repartition(16)
    got = _collect(quantile_histogram(ds)).set_index("p")["est_cents"]

    want = _serial_quantile_hist(prices, QUANT_BIN_W, (50, 90, 99))
    for p, est in want.items():
        assert got[p] == est  # merge order cannot change the histogram
        exact = np.percentile(
            np.floor(prices * 100.0 + 0.5).astype(np.int64), p,
            method="inverted_cdf",
        )
        # estimate lands in the exact value's bin: error <= bin width
        assert abs(got[p] - exact) <= QUANT_BIN_W


def test_quantile_histogram_empty_input(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"l_extendedprice": pa.array([], pa.float64())})
    )
    got = _collect(quantile_histogram(ds))
    assert len(got) == 0


def test_quantile_histogram_single_bin(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"l_extendedprice": [5.0] * 100}))
    got = _collect(quantile_histogram(ds))
    assert (got["est_cents"] == QUANT_BIN_W // 2).all()
    assert sorted(got["p"]) == [50, 90, 99]
