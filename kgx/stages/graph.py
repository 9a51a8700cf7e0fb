"""Iterative graph analytics over Ray Data: integer fixed-point PageRank.

The KG the reference extracts is consumed as a graph (entities/adjacency,
reference ``src/graph/builder.py`` semantics); ranking its nodes is the
canonical downstream analytics step, and at 100 TB the graph lives in the
object store, not on the driver.  This module runs power iteration with
LABELS-AS-A-DATASET — the same round structure as
``kgx.stages.cluster.label_propagation_ds`` (co-partitioned message
exchange per round, ``pin`` bounding per-round block count, only scalar
convergence state on the driver).

All arithmetic is INTEGER fixed-point so the DuckDB oracle reproduces it
bit-exactly (the kgx driver-contract convention):

    r_0(v)     = R0                            (1e9 per node)
    r_{t+1}(v) = BASE + sum over in-edges u->v of (r_t(u) * DAMP_NUM)
                                               // (DAMP_DEN * outdeg(u))

with BASE = R0 * (DAMP_DEN - DAMP_NUM) // DAMP_DEN.  Floor division on
non-negative ints is identical in numpy and DuckDB ``//``; sums of int64
are order-independent, so the result is exact regardless of partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

R0 = 1_000_000_000
DAMP_NUM = 85
DAMP_DEN = 100
BASE = R0 * (DAMP_DEN - DAMP_NUM) // DAMP_DEN

_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("pr", pa.int64())])


def _pin(ds, n_parts: int):
    """Bound block count and cut lineage between rounds (see
    cluster.label_propagation_ds.pin: union+groupby preserve input block
    counts, so an unpinned loop grows blocks — and per-round task cost —
    geometrically)."""
    import ray.data as rd

    return rd.from_arrow_refs(ds.repartition(n_parts).materialize().to_arrow_refs())


def pagerank_ds(edges_ds, iterations: int = 3, num_partitions: int | None = None):
    """edges (src:int64, dst:int64) -> (node, pr) after ``iterations`` rounds
    of integer power iteration.  Nodes are the distinct edge endpoints.

    Per round: ranks and degree-carrying edges co-locate by hash(src) (one
    partition-only exchange), a vectorized pandas kernel emits per-dst
    partial contributions, and the keyed combiner exchange sums them into
    the next rank vector — no per-node Python at unbounded node counts.
    Dangling nodes cannot occur when the caller supplies a symmetrized
    edge set (every endpoint has outdegree >= 1); isolated nodes are out of
    scope (they hold the closed-form rank BASE + 0 forever).
    """
    import pandas as pd
    import ray

    from .exchange import hash_partitioned_agg, hash_partitioned_apply

    P = num_partitions or max(8, int(ray.cluster_resources().get("CPU", 8)))

    # ---- distinct edges + outdegree, built once ----------------------------
    def edge_combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.drop_duplicates(subset=["src", "dst"])[["src", "dst"]]

    dedup_edges = hash_partitioned_agg(edges_ds, ["src"], edge_combine, P)

    def degree_kernel(df: "pd.DataFrame") -> "pd.DataFrame":
        deg = df.groupby("src", sort=False)["dst"].transform("size")
        return pd.DataFrame(
            {
                "src": df["src"].astype("int64"),
                "dst": df["dst"].astype("int64"),
                "outdeg": deg.astype("int64"),
            }
        )

    # src-keyed exchange: outdeg attaches where the per-round kernel needs
    # it anyway, so the iteration ships no degree table separately
    keyed_edges = hash_partitioned_apply(
        dedup_edges, ["src"], degree_kernel, P, int_keys=True
    )

    # ---- r0: every endpoint node at R0 ------------------------------------
    def seed(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [batch["src"].to_numpy(), batch["dst"].to_numpy()]
        ).astype(np.int64)
        return pa.table(
            {"node": nodes, "pr": np.full(len(nodes), R0, dtype=np.int64)},
            schema=_RANK_SCHEMA,
        )

    def first_per_node(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.drop_duplicates(subset=["node"])[["node", "pr"]]

    ranks = hash_partitioned_agg(
        dedup_edges.map_batches(seed, batch_format="pyarrow"),
        ["node"], first_per_node, P,
    )

    # ---- rounds ------------------------------------------------------------
    edge_cols = pa.schema(
        [("node", pa.int64()), ("dst", pa.int64()), ("outdeg", pa.int64()),
         ("pr", pa.int64())]
    )

    def as_edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": batch["src"],
                "dst": batch["dst"],
                "outdeg": batch["outdeg"],
                "pr": pa.array(np.full(n, -1, dtype=np.int64)),
            },
            schema=edge_cols,
        )

    def as_rank_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        neg = pa.array(np.full(n, -1, dtype=np.int64))
        return pa.table(
            {"node": batch["node"], "dst": neg, "outdeg": neg, "pr": batch["pr"]},
            schema=edge_cols,
        )

    def contribute(df: "pd.DataFrame") -> "pd.DataFrame":
        ranks_part = df[df["dst"] < 0][["node", "pr"]]
        edges_part = df[df["dst"] >= 0][["node", "dst", "outdeg"]]
        m = edges_part.merge(ranks_part, on="node", how="inner")
        contrib = (m["pr"].to_numpy() * DAMP_NUM) // (
            DAMP_DEN * m["outdeg"].to_numpy()
        )
        out = pd.DataFrame({"node": m["dst"].to_numpy(), "partial": contrib})
        # pre-sum per dst before the combiner exchange
        return out.groupby("node", sort=False, as_index=False).agg(
            partial=("partial", "sum")
        )

    def sum_partials(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby("node", sort=False, as_index=False).agg(
            partial=("partial", "sum")
        )

    keyed_edge_rows = _pin(
        keyed_edges.map_batches(as_edge_rows, batch_format="pyarrow"), P
    )
    ranks = _pin(ranks, P)

    for _ in range(iterations):
        tagged = keyed_edge_rows.union(
            ranks.map_batches(as_rank_rows, batch_format="pyarrow")
        )
        partials = hash_partitioned_apply(tagged, ["node"], contribute, P,
                                          int_keys=True)
        summed = hash_partitioned_agg(partials, ["node"], sum_partials, P)

        def next_rank(df: "pd.DataFrame") -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "node": df["node"].astype("int64"),
                    "pr": (BASE + df["partial"]).astype("int64"),
                }
            )

        ranks = _pin(summed.map_batches(next_rank, batch_format="pandas"), P)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch["node"], "pr": batch["pr"]}, schema=_RANK_SCHEMA
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")


def supplier_part_pagerank(sf_dir: str, iterations: int = 3):
    """PageRank over the symmetrized supplier<->part incidence graph from
    lineitem (node = 2*suppkey for suppliers, 2*partkey+1 for parts) — the
    relational stand-in for ranking a KG's entity graph."""
    from pathlib import Path

    import ray.data as rd

    li = rd.read_parquet(
        str(Path(sf_dir) / "lineitem.parquet"),
        columns=["l_suppkey", "l_partkey"],
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        supp = batch["l_suppkey"].to_numpy().astype(np.int64) * 2
        part = batch["l_partkey"].to_numpy().astype(np.int64) * 2 + 1
        return pa.table(
            {
                "src": np.concatenate([supp, part]),
                "dst": np.concatenate([part, supp]),
            },
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        )

    return pagerank_ds(li.map_batches(to_edges, batch_format="pyarrow"),
                       iterations=iterations)


def sql_supplier_part_pagerank(iterations: int = 3) -> str:
    """DuckDB oracle: the same integer fixed-point power iteration, one CTE
    level per round (aggregation is illegal in a recursive term, so the
    fixed iteration count unrolls statically)."""
    prev = "r0"
    lines = [
        "WITH e0 AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT)*2 AS src, "
        "CAST(l_partkey AS BIGINT)*2+1 AS dst FROM lineitem), "
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0), "
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg "
        "FROM edges GROUP BY src), "
        "nodes AS (SELECT DISTINCT src AS node FROM edges), "
        f"r0 AS (SELECT node, CAST({R0} AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        lines.append(
            f", r{i} AS (SELECT e.dst AS node, "
            f"CAST({BASE} + sum((p.pr * {DAMP_NUM}) // ({DAMP_DEN} * d.outdeg)) "
            "AS BIGINT) AS pr "
            f"FROM edges e JOIN {prev} p ON p.node = e.src "
            "JOIN deg d ON d.src = e.src GROUP BY e.dst)"
        )
        prev = f"r{i}"
    lines.append(
        f" SELECT CAST(node AS BIGINT) AS node, CAST(pr AS BIGINT) AS pr "
        f"FROM {prev}"
    )
    return "".join(lines)
