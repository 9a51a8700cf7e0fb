"""Corpus-level statistics operators for training-data curation:
deterministic hash sampling and global top-k n-gram counting.

Both are staple stages of an LLM-data pipeline (subsample a corpus
reproducibly; build a vocabulary / boilerplate-phrase list) expressed
Ray-Data-first, with the decision rules in pure integer arithmetic so the
DuckDB oracle reproduces them bit-exactly (the kgx driver-contract
convention; see kgx/sql_oracles.py for the HUGEINT wraparound technique).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Wraparound-multiply hash constants (Knuth-style multiplicative hashing).
# Mirrored verbatim in the SQL oracle: DuckDB computes the same product in
# HUGEINT and reduces mod 2^64, numpy wraps natively in uint64.
SAMPLE_MUL = 0x9E3779B97F4A7C15
SAMPLE_ADD = 0x632BE59BD9B4E019


def sample_bucket_np(ids: np.ndarray, buckets: int = 1000) -> np.ndarray:
    """Deterministic per-id sample bucket: top 32 bits of the wraparound
    product (the low bits of a multiplicative hash are weaker) mod buckets.
    Fully vectorized — no per-row Python, unlike an md5-based fingerprint."""
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * np.uint64(SAMPLE_MUL) + np.uint64(SAMPLE_ADD)
    return ((h >> np.uint64(32)) % np.uint64(buckets)).astype(np.int64)


def sample_documents(docs_ds, pct: int = 10, buckets: int = 1000):
    """documents -> the deterministic ``pct``% sample: rows whose hash bucket
    < pct * buckets / 100.  Reproducible across runs/cluster sizes (pure
    function of doc_id), stable under corpus growth (a kept doc stays kept),
    and embarrassingly parallel — one vectorized filter per batch, no
    shuffle.  Output carries the bucket so the oracle check pins the hash,
    not just the row count."""
    keep_below = pct * buckets // 100

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        bucket = sample_bucket_np(ids, buckets)
        mask = bucket < keep_below
        return pa.table(
            {
                "doc_id": pa.array(ids[mask]),
                "sample_bucket": pa.array(bucket[mask]),
            },
            schema=pa.schema(
                [("doc_id", pa.int64()), ("sample_bucket", pa.int64())]
            ),
        )

    return docs_ds.map_batches(kernel, batch_format="pyarrow")


def sql_sample_documents(pct: int = 10, buckets: int = 1000) -> str:
    """DuckDB oracle for sample_documents: the same wraparound multiply in
    HUGEINT, reduced mod 2^64, top-32-bits, mod buckets."""
    keep_below = pct * buckets // 100
    two64 = 1 << 64
    expr = (
        f"(((CAST(doc_id AS HUGEINT) * {SAMPLE_MUL} + {SAMPLE_ADD}) % {two64}) "
        f"// {1 << 32}) % {buckets}"
    )
    return (
        f"WITH b AS (SELECT doc_id, {expr} AS sample_bucket FROM documents) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(sample_bucket AS BIGINT) AS sample_bucket "
        f"FROM b WHERE sample_bucket < {keep_below}"
    )


# ---------------------------------------------------------------------------
# Global top-k n-grams (vocabulary / boilerplate-phrase mining)
# ---------------------------------------------------------------------------


def ngram_topk(docs_ds, n: int = 2, k: int = 20):
    """documents -> the k most frequent word n-grams corpus-wide, tie-break
    gram asc; output (gram, n_occurrences, rank).

    Counts combine per batch BEFORE the shuffle (one row per distinct gram
    per batch), the keyed exchange merges per partition vectorized, and only
    the final k-row sort reaches the driver — gram cardinality is unbounded
    at web scale but the exchange moves partial counts, never occurrences."""
    import pandas as pd

    from ..functions.text import tokenize
    from .exchange import hash_partitioned_agg

    def partial(batch: pa.Table) -> "pd.DataFrame":
        counts: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            toks = tokenize(text or "")
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                counts[g] = counts.get(g, 0) + 1
        return pd.DataFrame(
            {"gram": list(counts), "n_occurrences": list(counts.values())}
        )

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return (
            df.groupby("gram", sort=False, as_index=False)
            .agg(n_occurrences=("n_occurrences", "sum"))
        )

    counts = hash_partitioned_agg(
        docs_ds.map_batches(partial, batch_format="pyarrow"), ["gram"], combine
    )
    topk = counts.sort(["n_occurrences", "gram"], descending=[True, False]).limit(k)

    def add_rank(df: "pd.DataFrame") -> "pd.DataFrame":
        d = df.sort_values(["n_occurrences", "gram"], ascending=[False, True])
        d = d.reset_index(drop=True)
        d["rank"] = (d.index + 1).astype("int64")
        d["n_occurrences"] = d["n_occurrences"].astype("int64")
        return d[["gram", "n_occurrences", "rank"]]

    # k rows total: the rank projection is driver-scale by construction
    return topk.map_batches(add_rank, batch_format="pandas", batch_size=None)


def sql_ngram_topk(sql_token_list: str, n: int = 2, k: int = 20) -> str:
    """DuckDB oracle for ngram_topk over the shared tokenizer expression."""
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
WITH tok AS (SELECT {sql_token_list} AS toks FROM documents),
g AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - {n - 1}),
                i -> {gram})) AS gram
  FROM tok WHERE len(toks) >= {n}
),
c AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences FROM g GROUP BY gram
)
SELECT gram, n_occurrences,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, gram) AS BIGINT)
         AS "rank"
FROM c ORDER BY n_occurrences DESC, gram LIMIT {k}
"""
