"""Round-5 regression tests for the ADVICE r4 findings:

1. pmi_scores_np denominator overflow (c1*c2 >= 2**63 silently wrapped on
   the int64 fast path even when the numerator guard passed).
2. attach_payload_batch int32-offset overflow must raise, not corrupt.
3. sql_quantile_histogram / sql_grouped_quantile_histogram must drop NULL
   price/flag rows like the Ray kernels do, so the SQL-parity gate covers
   the hostile-null population too.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# 1. PMI denominator overflow
# ---------------------------------------------------------------------------


def test_pmi_denominator_overflow_falls_back_to_exact():
    from kgx.stages.corpus import PMI_SCALE, pmi_scores_np

    # marginals ~3.1e9 each: c1*c2 > 2**63 while the numerator guard
    # (c12.max * N * SCALE) stays comfortably under int64.
    big = 3_100_000_000
    c12 = np.array([10], dtype=np.int64)
    c1 = np.array([big], dtype=np.int64)
    c2 = np.array([big], dtype=np.int64)
    n_bigrams = 100_000
    want = (10 * n_bigrams * PMI_SCALE) // (big * big)  # exact Python int
    got = pmi_scores_np(c12, c1, c2, n_bigrams)
    assert got.dtype == np.int64
    assert int(got[0]) == want


def test_pmi_fast_path_unchanged_on_small_counts():
    from kgx.stages.corpus import PMI_SCALE, pmi_scores_np

    c12 = np.array([8, 3], dtype=np.int64)
    c1 = np.array([20, 7], dtype=np.int64)
    c2 = np.array([16, 9], dtype=np.int64)
    got = pmi_scores_np(c12, c1, c2, 1000)
    want = [(8 * 1000 * PMI_SCALE) // (20 * 16),
            (3 * 1000 * PMI_SCALE) // (7 * 9)]
    assert got.tolist() == want


# ---------------------------------------------------------------------------
# 2. attach_payload_batch offset-overflow guard
# ---------------------------------------------------------------------------


def test_attach_payload_normal_path_intact():
    from kgx.stages import multimodal as mm

    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["abc", "defg"]),
    })
    out = mm.attach_payload_batch(tbl)
    assert out.num_rows == 2
    assert pa.types.is_binary(out["payload"].type)


def test_attach_payload_guard_fires_before_allocation(monkeypatch):
    """Force offsets past 2**31 without allocating gigabytes: inflate the
    lengths the out_off cumsum sees.  The guard must raise BEFORE the
    out_data allocation / int32 cast would corrupt offsets."""
    from kgx.stages import multimodal as mm

    n = 3
    tbl = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(["x" * 16] * n),
    })

    real_cumsum = np.cumsum
    real_empty = np.empty

    def fake_cumsum(arr, *a, **kw):
        if kw.get("out") is not None and len(arr) == n:  # the out_off cumsum
            return real_cumsum(
                np.asarray(arr, dtype=np.int64) + 2**30, *a, **kw
            )
        return real_cumsum(arr, *a, **kw)

    def guarded_empty(shape, *a, **kw):
        if np.isscalar(shape) and shape >= 2**31:
            raise AssertionError("guard must fire before the allocation")
        return real_empty(shape, *a, **kw)

    monkeypatch.setattr(mm.np, "cumsum", fake_cumsum)
    monkeypatch.setattr(mm.np, "empty", guarded_empty)
    with pytest.raises(ValueError, match="int32 offsets"):
        mm.attach_payload_batch(tbl)


# ---------------------------------------------------------------------------
# 3. quantile SQL-oracle null parity
# ---------------------------------------------------------------------------


def _ray_df(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return res


def test_quantile_sql_parity_with_nulls(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from kgx.stages.sketch import (
        grouped_quantile_histogram,
        quantile_histogram,
        sql_grouped_quantile_histogram,
        sql_quantile_histogram,
    )

    rng = np.random.default_rng(7)
    n = 2000
    prices = np.round(rng.lognormal(6.0, 0.7, size=n), 2)
    flags = rng.choice(["A", "N", "R"], size=n).astype(object)
    # poison ~10% of each column with NULLs
    pm = rng.random(n) < 0.1
    fm = rng.random(n) < 0.1
    price_col = pa.array(
        [None if m else float(v) for v, m in zip(prices, pm)], pa.float64()
    )
    flag_col = pa.array([None if m else f for f, m in zip(flags, fm)])
    tbl = pa.table({"l_returnflag": flag_col, "l_extendedprice": price_col})
    path = tmp_path / "lineitem.parquet"
    pq.write_table(tbl, path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{path}'")

    ds = rd.read_parquet(str(path))
    ours = _ray_df(quantile_histogram(ds)).sort_values("p").reset_index(
        drop=True
    )
    theirs = con.execute(sql_quantile_histogram()).fetchdf().sort_values(
        "p"
    ).reset_index(drop=True)
    assert ours["est_cents"].tolist() == theirs["est_cents"].tolist()

    ds = rd.read_parquet(str(path))
    cols = ["l_returnflag", "p"]
    ours = _ray_df(grouped_quantile_histogram(ds)).sort_values(
        cols
    ).reset_index(drop=True)
    theirs = con.execute(
        sql_grouped_quantile_histogram()
    ).fetchdf().sort_values(cols).reset_index(drop=True)
    assert ours["l_returnflag"].tolist() == theirs["l_returnflag"].tolist()
    assert ours["est_cents"].tolist() == theirs["est_cents"].tolist()
