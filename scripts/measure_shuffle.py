#!/usr/bin/env python
"""Measure the TRUE shuffle volume of the inline vs slim pair layouts
(VERDICT r2 next-round #4): every dataset that feeds an all-to-all exchange
is materialized and its bytes recorded —

* inline: the one band/prefix exchange (payload rides every row) + the pair
  distinct exchange;
* slim:   keys-only band/prefix exchange + candidate-pair exchange + the two
  payload-resolve exchanges (payload table crosses twice, attached pairs
  once) — recorded via the ``measure`` hook inside the operators themselves,
  so nothing is estimated.

Also times each full operator end-to-end (no measure hook, warm session).
Prints one JSON line; numbers go to BASELINE.md.

Usage: [GRAFT_SF_DIR=...] [RAY_GRAFT_CPUS=...] python scripts/measure_shuffle.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from kgx.stages import dedup as D

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = rd.read_parquet(
        str(Path(sf_dir) / "documents.parquet"), columns=["doc_id", "text"]
    )
    n_docs = docs.count()

    def consume(ds) -> int:
        n = 0
        for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            n += b.num_rows
        return n

    def sized(ds):
        m = ds.materialize()
        return m.size_bytes(), m.count()

    out: dict = {"metric": "pair_layout_shuffle_bytes", "sf": sf_dir, "n_docs": n_docs}

    ops = {
        "minhash": (D.minhash_lsh_pairs, {}),
        "ngram": (D.ngram_jaccard_pairs, {"n": 3, "threshold": 0.8}),
    }
    for name, (fn, kw) in ops.items():
        rec: dict = {}
        # inline exchange input: the payload-carrying band/prefix rows
        if name == "minhash":
            inline_rows = docs.map_batches(
                lambda b: D._minhash_band_rows(b, 64, 16, 5), batch_format="pyarrow"
            )
        else:
            inline_rows = docs.map_batches(
                lambda b: D._ngram_prefix_rows(b, 3, 0.8), batch_format="pyarrow"
            )
        b_inline, n_rows = sized(inline_rows)
        rec["inline_exchange_bytes"] = b_inline
        rec["inline_rows"] = n_rows

        # slim: run the real operator with the measure hook
        m: dict = {}
        pairs_slim = consume(fn(docs, layout="slim", measure=m, **kw))
        rec["slim"] = m
        rec["slim_exchange_bytes"] = (
            m["band_rows_bytes"] + m["exchange1_bytes"] + m["exchange2_bytes"]
        )
        rec["slim_pairs"] = pairs_slim
        rec["bytes_ratio_inline_over_slim"] = round(
            b_inline / rec["slim_exchange_bytes"], 2
        )

        # wall time, both layouts, no measurement materialization
        for layout in ("inline", "slim"):
            t0 = time.perf_counter()
            n_pairs = consume(fn(docs, layout=layout, **kw))
            rec[f"{layout}_sec"] = round(time.perf_counter() - t0, 3)
            rec[f"{layout}_pairs"] = n_pairs
        out[name] = rec

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
