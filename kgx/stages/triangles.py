"""Exact distributed triangle counting — the standard graph-health /
community-density statistic over a CONSTRUCTED graph: suppliers are
connected when they co-supply the same order, so the operator exercises
both halves of the classic pipeline (relational -> graph projection, then
degree-ordered triangle enumeration).

Scale shape (all existing exchange machinery, no new primitives):

1. co-supplier edges: partition-only exchange on l_orderkey; the kernel
   builds per-order distinct supplier pairs with a fully-vectorized
   within-group pair generator (no per-order Python) — pair volume per
   order is C(lines, 2), bounded by the order's line count;
2. edge dedup + degree: combiner-pre-deduped exchanges (the dedup_exact /
   degree_histogram shapes);
3. DEGREE-ORDERED orientation: each undirected edge points from its
   lower-(degree, id) endpoint — the out-degree of any node is then
   O(sqrt(m)) (Chiba–Nishizeki), so per-source wedge generation cannot
   blow up on hubs the way id-only orientation does;
4. wedges + closure: per-source neighbor pairs (ordered by rank) meet the
   oriented edge set in ONE pair-keyed exchange; per-partition match
   counts tree-sum to a single (n_triangles) row.

Degrees attach to edge endpoints via kind-discriminated union rows through
the SAME keyed exchanges (the inverted-index pattern) — no driver-side
node map at any point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pairs_within_groups(starts: np.ndarray, sizes: np.ndarray, n: int):
    """All (i < j) GLOBAL index pairs within contiguous groups of a sorted
    array — fully vectorized: element idx pairs with the idx+1..group_end
    range that follows it."""
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    ends = np.repeat(starts + sizes, sizes)
    idx = np.arange(n, dtype=np.int64)
    reps = ends - idx - 1
    total = int(reps.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    left = np.repeat(idx, reps)
    block_starts = np.cumsum(reps) - reps
    right = (np.arange(total, dtype=np.int64)
             - np.repeat(block_starts, reps) + left + 1)
    return left, right


def _group_bounds(keys: np.ndarray):
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    sizes = np.diff(np.r_[starts, len(keys)])
    return starts, sizes


def cosupplier_triangles(lineitem_ds, num_partitions: int | None = None,
                         broadcast_deg_limit: int = 2_000_000,
                         per_edge: bool = False, jaccard: bool = False,
                         clustering: bool = False):
    """lineitem -> one row (n_triangles,): exact triangle count of the
    co-supplier graph (edge iff two suppliers share an order).

    With ``per_edge=True`` the SAME pipeline instead returns (a, b,
    n_common) — the common-neighbor count of every edge with >= 1 (the
    classic link-prediction feature): wedges carry their center c through
    the closure, each matched wedge is a triangle {c, u, w} whose THREE
    id-normalized edges gain one common neighbor, and a final
    (a, b)-keyed count combiner folds them.  Extra wire cost over the
    count mode is one int64 column on the wedge rows plus a
    triangle-volume count exchange.

    With ``clustering=True`` the pipeline instead returns the per-node
    LOCAL CLUSTERING COEFFICIENT table (node, deg, n_tri, cc_pm): each
    matched wedge is a triangle crediting its three nodes +1; a
    node-keyed count combiner folds the credits to T(v); degrees join
    back in (riding the same broadcast-vs-exchange cost gate as the
    orientation) and cc_pm = 10000 * T(v) // C(deg, 2) exactly in
    integers.  Nodes with deg >= 2 and ZERO triangles appear with
    cc_pm = 0 — the deg table (all nodes) drives the final join, not
    the triangle credits."""
    import pandas as pd

    from .exchange import hash_partitioned_agg, hash_partitioned_apply

    if clustering:
        per_edge = True        # wedge rows must carry their center node

    # -- 1. per-order supplier pairs (a < b), combiner-deduped per batch --
    def order_pairs_kernel(d: "pd.DataFrame") -> "pd.DataFrame":
        d = d.dropna(subset=["l_orderkey", "l_suppkey"])
        d = d.drop_duplicates(subset=["l_orderkey", "l_suppkey"]).sort_values(
            ["l_orderkey", "l_suppkey"]
        )
        o = d["l_orderkey"].to_numpy()
        s = d["l_suppkey"].to_numpy().astype(np.int64)
        starts, sizes = _group_bounds(o)
        li, ri = _pairs_within_groups(starts, sizes, len(o))
        return pd.DataFrame(
            {"a": s[li], "b": s[ri]}
        ).drop_duplicates()

    pairs = hash_partitioned_apply(
        lineitem_ds, ["l_orderkey"], order_pairs_kernel, num_partitions,
        int_keys=True,
    )

    # -- 2. distinct edges ------------------------------------------------
    def edge_dedup(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.drop_duplicates(subset=["a", "b"])[["a", "b"]]

    # edges / deg / oriented are each consumed by TWO downstream branches;
    # Ray re-executes a lazy plan per consumer, so the shared graph-sized
    # intermediates pin once (the pagerank partition-pinning rationale —
    # without this the diamond reuse re-runs the edge build ~6x)
    edges = hash_partitioned_apply(
        pairs.map_batches(edge_dedup, batch_format="pandas"),
        ["a", "b"], edge_dedup, num_partitions, int_keys=True,
    ).materialize()

    # -- 3. degrees (undirected), then attach to both endpoints ----------
    def symmetrize(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd2

        return pd2.DataFrame(
            {"node": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
             "cnt": np.ones(2 * len(df), dtype=np.int64)}
        )

    def deg_combine(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby("node", sort=False, as_index=False).agg(
            cnt=("cnt", "sum")
        )

    deg = hash_partitioned_agg(
        edges.map_batches(symmetrize, batch_format="pandas"),
        ["node"], deg_combine, num_partitions,
    ).materialize()

    # kind-discriminated union through a node-keyed exchange: edge rows key
    # by ONE endpoint, degree rows by their node; the kernel maps deg onto
    # that endpoint (inverted-index pattern — no driver-side node map)
    def _attach(edge_rows, edge_cols, key_col, deg_out_col):
        # union schema: edge_cols + [node, cnt]; deg rows fill edge cols
        # with -1 and keep cnt >= 0 as their discriminator (real degrees
        # are >= 1, edge rows carry cnt = -1); column ORDER matches across
        # both union branches
        all_cols = list(edge_cols) + ["node", "cnt"]

        def to_union_edges(df: "pd.DataFrame") -> "pd.DataFrame":
            out = df.copy()
            out["node"] = out[key_col].astype("int64")
            out["cnt"] = np.int64(-1)
            return out[all_cols]

        def to_union_deg(df: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd2

            out = pd2.DataFrame(
                {c: np.full(len(df), -1, dtype=np.int64)
                 for c in edge_cols}
            )
            out["node"] = df["node"].to_numpy().astype(np.int64)
            out["cnt"] = df["cnt"].to_numpy().astype(np.int64)
            return out[all_cols]

        def kernel(d: "pd.DataFrame") -> "pd.DataFrame":
            dd = d[d["cnt"] >= 0]
            ee = d[d["cnt"] < 0]
            m = ee.merge(dd[["node", "cnt"]].rename(
                columns={"cnt": deg_out_col}), on="node", how="inner")
            return m.drop(columns=["node", "cnt"])

        u = edge_rows.map_batches(
            to_union_edges, batch_format="pandas"
        ).union(deg.map_batches(to_union_deg, batch_format="pandas"))
        return hash_partitioned_apply(u, ["node"], kernel, num_partitions,
                                      int_keys=True)

    # -- 4. orient by (degree, id); wedges; closure -----------------------
    def _orient_arrays(a, b, da, db):
        fwd = (da < db) | ((da == db) & (a < b))
        import pandas as pd2

        return pd2.DataFrame(
            {"src": np.where(fwd, a, b), "dst": np.where(fwd, b, a),
             "ddst": np.where(fwd, db, da).astype(np.int64)}
        )

    # cost gate (the anti-join broadcast-vs-native precedent): the degree
    # table is node-sized — when it fits the broadcast budget, ship it once
    # via ray.put and orient in ONE map over the edges, skipping both
    # attach exchanges; the exchange path remains the unbounded-node route
    deg_bcast_ref = None
    if deg.count() <= broadcast_deg_limit:
        import pandas as pd_b
        import ray

        deg_pd = deg.to_pandas()
        deg_ref = ray.put(
            pd_b.Series(deg_pd["cnt"].values, index=deg_pd["node"].values)
        )
        deg_bcast_ref = deg_ref

        def orient_bcast(df: "pd.DataFrame") -> "pd.DataFrame":
            import ray as _ray

            s = _ray.get(deg_ref)
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            da = s.reindex(a).to_numpy().astype(np.int64)
            db = s.reindex(b).to_numpy().astype(np.int64)
            return _orient_arrays(a, b, da, db)

        oriented = edges.map_batches(
            orient_bcast, batch_format="pandas"
        ).materialize()
    else:
        e_da = _attach(edges, ["a", "b"], "a", "da")
        e_db = _attach(e_da, ["a", "b", "da"], "b", "db")

        def orient(df: "pd.DataFrame") -> "pd.DataFrame":
            return _orient_arrays(
                df["a"].to_numpy(), df["b"].to_numpy(),
                df["da"].to_numpy(), df["db"].to_numpy(),
            )

        oriented = e_db.map_batches(orient, batch_format="pandas").materialize()

    def wedge_kernel(d: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd2

        # neighbors sorted by rank (ddst, dst) per src; all rank-ordered
        # pairs (u, w) — out-degree is O(sqrt(m)) under the orientation
        d = d.sort_values(["src", "ddst", "dst"])
        srcs = d["src"].to_numpy()
        dst = d["dst"].to_numpy()
        starts, sizes = _group_bounds(srcs)
        li, ri = _pairs_within_groups(starts, sizes, len(srcs))
        out = {"u": dst[li], "w": dst[ri],
               "kind": np.zeros(len(li), dtype=np.int64)}
        if per_edge:
            out["c"] = srcs[li]          # wedge center rides along
        return pd2.DataFrame(out)

    wedges = hash_partitioned_apply(
        oriented, ["src"], wedge_kernel, num_partitions, int_keys=True
    )

    def edge_probe_rows(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd2

        out = {"u": df["src"], "w": df["dst"],
               "kind": np.ones(len(df), dtype=np.int64)}
        if per_edge:
            out["c"] = np.full(len(df), -1, dtype=np.int64)
        return pd2.DataFrame(out)

    probe = wedges.union(
        oriented.map_batches(edge_probe_rows, batch_format="pandas")
    )

    if clustering:
        def close_nodes_kernel(d: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd2

            w = d[d["kind"] == 0]
            e = d[d["kind"] == 1].drop_duplicates(subset=["u", "w"])
            m = w.merge(e[["u", "w"]], on=["u", "w"], how="inner")
            # triangle {c, u, v}: each of the three nodes gains one
            # triangle; pre-count per partition (the combiner)
            nodes = np.concatenate([m["u"].to_numpy(), m["w"].to_numpy(),
                                    m["c"].to_numpy()])
            out = pd2.DataFrame({"node": nodes.astype(np.int64)})
            out["n_tri"] = np.int64(1)
            return out.groupby("node", sort=False, as_index=False).agg(
                n_tri=("n_tri", "sum"))

        tri_nodes = hash_partitioned_apply(
            probe, ["u", "w"], close_nodes_kernel, num_partitions,
            int_keys=True)
        tri = hash_partitioned_agg(
            tri_nodes, ["node"],
            lambda df: df.groupby("node", sort=False, as_index=False).agg(
                n_tri=("n_tri", "sum")),
            num_partitions)

        def _cc_cols(node, dg, t) -> "pd.DataFrame":
            import pandas as pd2

            keep = dg >= 2
            node, dg, t = node[keep], dg[keep], t[keep]
            return pd2.DataFrame(
                {"node": node, "deg": dg, "n_tri": t,
                 "cc_pm": 10_000 * t // (dg * (dg - 1) // 2)})

        if deg_bcast_ref is not None:
            import ray

            # tri is node-scale; under the gate it fits the driver just
            # like deg_pd (already collected above) — ship it once and
            # drive from the FULL degree table so zero-triangle nodes
            # appear with cc_pm = 0
            tri_pd = tri.to_pandas()
            tri_ref = ray.put(pd.Series(
                tri_pd["n_tri"].values, index=tri_pd["node"].values))

            def cc_bcast(df: "pd.DataFrame") -> "pd.DataFrame":
                import ray as _ray

                ts_ = _ray.get(tri_ref)
                node = df["node"].to_numpy().astype(np.int64)
                dg = df["cnt"].to_numpy().astype(np.int64)
                t = ts_.reindex(node).fillna(0).to_numpy().astype(np.int64)
                return _cc_cols(node, dg, t)

            return deg.map_batches(cc_bcast, batch_format="pandas")

        # unbounded route: deg rows (kind 0, carry cnt) and tri rows
        # (kind 1, carry n_tri) meet in ONE node-keyed exchange
        def deg_u(df: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd2

            return pd2.DataFrame(
                {"node": df["node"].to_numpy().astype(np.int64),
                 "kind": np.zeros(len(df), dtype=np.int64),
                 "val": df["cnt"].to_numpy().astype(np.int64)})

        def tri_u(df: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd2

            return pd2.DataFrame(
                {"node": df["node"].to_numpy().astype(np.int64),
                 "kind": np.ones(len(df), dtype=np.int64),
                 "val": df["n_tri"].to_numpy().astype(np.int64)})

        u = deg.map_batches(deg_u, batch_format="pandas").union(
            tri.map_batches(tri_u, batch_format="pandas"))

        def cc_kernel(d: "pd.DataFrame") -> "pd.DataFrame":
            dd = d[d["kind"] == 0]
            tt = d[d["kind"] == 1]
            m = dd.merge(tt[["node", "val"]].rename(columns={"val": "t"}),
                         on="node", how="left")
            return _cc_cols(m["node"].to_numpy().astype(np.int64),
                            m["val"].to_numpy().astype(np.int64),
                            m["t"].fillna(0).to_numpy().astype(np.int64))

        return hash_partitioned_apply(u, ["node"], cc_kernel,
                                      num_partitions, int_keys=True)

    if per_edge:
        def close_edges_kernel(d: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd2

            w = d[d["kind"] == 0]
            e = d[d["kind"] == 1].drop_duplicates(subset=["u", "w"])
            m = w.merge(e[["u", "w"]], on=["u", "w"], how="inner")
            u = m["u"].to_numpy()
            v = m["w"].to_numpy()
            c = m["c"].to_numpy()
            # triangle {c, u, v}: all three id-normalized edges gain one
            # common neighbor; pre-count per partition (the combiner)
            a = np.concatenate([np.minimum(u, v), np.minimum(c, u),
                                np.minimum(c, v)])
            b = np.concatenate([np.maximum(u, v), np.maximum(c, u),
                                np.maximum(c, v)])
            out = pd2.DataFrame({"a": a, "b": b})
            out["n_common"] = np.int64(1)
            return out.groupby(["a", "b"], sort=False, as_index=False).agg(
                n_common=("n_common", "sum")
            )

        tri_edges = hash_partitioned_apply(
            probe, ["u", "w"], close_edges_kernel, num_partitions,
            int_keys=True,
        )

        def cn_combine(df: "pd.DataFrame") -> "pd.DataFrame":
            return df.groupby(["a", "b"], sort=False, as_index=False).agg(
                n_common=("n_common", "sum")
            )

        cn = hash_partitioned_agg(
            tri_edges, ["a", "b"], cn_combine, num_partitions
        )
        if not jaccard:
            return cn

        # -- Jaccard mode: attach deg(a), deg(b) and emit the exact
        # integer permyriad score 10000 * |N(a) n N(b)| // |N(a) u N(b)|
        # (union = da + db - n_common; b in N(a) and a in N(b), so the
        # union counts both endpoints — the standard link-prediction
        # convention).  Degree attach rides the SAME cost gate as the
        # orientation: broadcast Series when node count fits, else the
        # two kind-discriminated node-keyed attach exchanges.
        def _jacc_cols(df: "pd.DataFrame", da, db) -> "pd.DataFrame":
            import pandas as pd2

            n = df["n_common"].to_numpy().astype(np.int64)
            return pd2.DataFrame(
                {"a": df["a"].to_numpy().astype(np.int64),
                 "b": df["b"].to_numpy().astype(np.int64),
                 "n_common": n,
                 "jacc_pm": 10_000 * n // (da + db - n)})

        if deg_bcast_ref is not None:
            import ray

            def jacc_bcast(df: "pd.DataFrame") -> "pd.DataFrame":
                s = ray.get(deg_bcast_ref)
                da = s.reindex(df["a"]).to_numpy().astype(np.int64)
                db = s.reindex(df["b"]).to_numpy().astype(np.int64)
                return _jacc_cols(df, da, db)

            return cn.map_batches(jacc_bcast, batch_format="pandas")

        j_da = _attach(cn, ["a", "b", "n_common"], "a", "da")
        j_db = _attach(j_da, ["a", "b", "n_common", "da"], "b", "db")

        def jacc_final(df: "pd.DataFrame") -> "pd.DataFrame":
            return _jacc_cols(df, df["da"].to_numpy().astype(np.int64),
                              df["db"].to_numpy().astype(np.int64))

        return j_db.map_batches(jacc_final, batch_format="pandas")

    def close_kernel(d: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd2

        w = d[d["kind"] == 0]
        e = d[d["kind"] == 1].drop_duplicates(subset=["u", "w"])
        n = len(w.merge(e[["u", "w"]], on=["u", "w"], how="inner"))
        return pd2.DataFrame({"n_triangles": [np.int64(n)]})

    counts = hash_partitioned_apply(
        probe, ["u", "w"], close_kernel, num_partitions, int_keys=True
    )

    def total(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd2

        return pd2.DataFrame(
            {"n_triangles": [np.int64(df["n_triangles"].sum())]}
        )

    # per-partition counts are tiny: one coalesced block sums them
    return counts.repartition(1).map_batches(
        total, batch_format="pandas", batch_size=None
    )


def sql_cosupplier_triangles() -> str:
    """DuckDB oracle: same graph, same count — rank-DAG triple join (each
    triangle counted once)."""
    return """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem
), e AS (
  SELECT DISTINCT x.s AS a, y.s AS b
  FROM ls x JOIN ls y ON x.o = y.o AND x.s < y.s
), und AS (
  SELECT a AS node, b AS other FROM e
  UNION ALL SELECT b AS node, a AS other FROM e
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY node
), o AS (
  SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
         CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst
  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM o e1 JOIN o e2 ON e2.src = e1.dst
JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""


def sql_common_neighbors() -> str:
    """DuckDB oracle for per_edge mode: common neighbors of edge (a, b)
    directly — symmetric adjacency self-joined through the shared
    neighbor.  c = a / c = b are impossible (no self-loops), so no extra
    filter is needed; only edges with >= 1 common neighbor appear,
    matching the Ray side's count-of-matched-triangles semantics."""
    return """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem
), e AS (
  SELECT DISTINCT x.s AS a, y.s AS b
  FROM ls x JOIN ls y ON x.o = y.o AND x.s < y.s
), und AS (
  SELECT a AS node, b AS other FROM e
  UNION ALL SELECT b AS node, a AS other FROM e
)
SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS n_common
FROM e
JOIN und n1 ON n1.node = e.a
JOIN und n2 ON n2.node = e.b AND n2.other = n1.other
GROUP BY e.a, e.b
"""


def sql_local_clustering() -> str:
    """DuckDB oracle for clustering mode: per-node triangle count derived
    from the common-neighbor counts (sum over a node's incident edges of
    n_common = 2 * T(v), always even), LEFT-joined onto the full degree
    table so zero-triangle deg>=2 nodes appear with cc_pm = 0; integer
    permyriad floor division mirrors 10000 * T // (deg*(deg-1)//2)."""
    return """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem
), e AS (
  SELECT DISTINCT x.s AS a, y.s AS b
  FROM ls x JOIN ls y ON x.o = y.o AND x.s < y.s
), und AS (
  SELECT a AS node, b AS other FROM e
  UNION ALL SELECT b AS node, a AS other FROM e
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY node
), cn AS (
  SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS n_common
  FROM e
  JOIN und n1 ON n1.node = e.a
  JOIN und n2 ON n2.node = e.b AND n2.other = n1.other
  GROUP BY e.a, e.b
), creds AS (
  SELECT a AS node, n_common FROM cn
  UNION ALL SELECT b AS node, n_common FROM cn
), tri AS (
  SELECT node, CAST(sum(n_common) // 2 AS BIGINT) AS n_tri
  FROM creds GROUP BY node
)
SELECT d.node, d.d AS deg,
       CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(10000 * COALESCE(t.n_tri, 0) // (d.d * (d.d - 1) // 2)
            AS BIGINT) AS cc_pm
FROM deg d LEFT JOIN tri t ON t.node = d.node
WHERE d.d >= 2
"""


def sql_cosupplier_jaccard() -> str:
    """DuckDB oracle for jaccard mode: the common-neighbor oracle joined
    to the degree CTE; integer permyriad floor division mirrors the Ray
    side's 10000 * n // (da + db - n)."""
    return """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem
), e AS (
  SELECT DISTINCT x.s AS a, y.s AS b
  FROM ls x JOIN ls y ON x.o = y.o AND x.s < y.s
), und AS (
  SELECT a AS node, b AS other FROM e
  UNION ALL SELECT b AS node, a AS other FROM e
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY node
), cn AS (
  SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS n_common
  FROM e
  JOIN und n1 ON n1.node = e.a
  JOIN und n2 ON n2.node = e.b AND n2.other = n1.other
  GROUP BY e.a, e.b
)
SELECT cn.a, cn.b, cn.n_common,
       CAST(10000 * cn.n_common // (da.d + db.d - cn.n_common) AS BIGINT)
         AS jacc_pm
FROM cn JOIN deg da ON da.node = cn.a JOIN deg db ON db.node = cn.b
"""


def _distinct_pair_weights(lineitem_ds, num_partitions: int | None = None):
    """lineitem -> globally distinct weighted co-supplier pairs (a, b, w):
    stage 1 is the triangle pipeline's orderkey exchange KEEPING one row
    per (order, pair) with an in-partition pre-fold (an order lives wholly
    in one partition, so nothing is lost); stage 2 sums weights in an
    (a, b)-keyed combiner — after it each pair exists exactly once."""
    import pandas as pd

    from .exchange import hash_partitioned_agg, hash_partitioned_apply

    def order_pair_weights(d: "pd.DataFrame") -> "pd.DataFrame":
        d = d.dropna(subset=["l_orderkey", "l_suppkey"])
        d = d.drop_duplicates(subset=["l_orderkey", "l_suppkey"]).sort_values(
            ["l_orderkey", "l_suppkey"])
        o = d["l_orderkey"].to_numpy()
        s = d["l_suppkey"].to_numpy().astype(np.int64)
        starts, sizes = _group_bounds(o)
        li, ri = _pairs_within_groups(starts, sizes, len(o))
        g = pd.DataFrame({"a": s[li], "b": s[ri]})
        g["w"] = np.int64(1)
        return g.groupby(["a", "b"], sort=False, as_index=False).agg(
            w=("w", "sum"))

    pair_w = hash_partitioned_apply(
        lineitem_ds, ["l_orderkey"], order_pair_weights, num_partitions,
        int_keys=True)

    return hash_partitioned_agg(
        pair_w, ["a", "b"],
        lambda df: df.groupby(["a", "b"], sort=False, as_index=False).agg(
            w=("w", "sum")),
        num_partitions)


def cosupplier_edge_weights(lineitem_ds, num_partitions: int | None = None):
    """lineitem -> (weight, n_edges): histogram of co-supplier edge
    multiplicities — weight = number of DISTINCT orders a supplier pair
    shares, the graph's edge-strength distribution (the thresholding
    signal for pruning weak co-occurrence edges before the expensive
    wedge pipelines).

    Stages 1-2 are the shared distinct-pair build; stage 3 folds the
    bounded weight histogram.  No wedges, no orientation — strictly
    cheaper than any triangle-family query."""
    import pandas as pd

    from .exchange import hash_partitioned_agg

    weights = _distinct_pair_weights(lineitem_ds, num_partitions)

    def hist_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        vc = df["w"].value_counts()
        return pd.DataFrame(
            {"weight": vc.index.to_numpy().astype("int64"),
             "n_edges": vc.to_numpy().astype("int64")})

    return hash_partitioned_agg(
        weights.map_batches(hist_partial, batch_format="pandas"),
        ["weight"],
        lambda df: df.groupby("weight", sort=False, as_index=False).agg(
            n_edges=("n_edges", "sum")),
        num_partitions)


def cosupplier_degree_moments(lineitem_ds, num_partitions: int | None = None):
    """lineitem -> ONE row (n_nodes, n_edges, n_wedges, max_deg): exact
    degree-distribution moments of the co-supplier graph — the pre-flight
    a scheduler reads BEFORE launching the wedge pipelines (n_wedges =
    sum C(d, 2) is exactly the candidate volume cosupplier_triangles will
    generate; max_deg bounds the hottest partition).

    Stages 1-2 are the shared distinct-pair build; stage 3 emits both
    endpoints of each distinct edge into a node-keyed degree combiner;
    stage 4 folds per-batch scalar moment partials (constant key — a
    driver-scale single-row exchange).  n_edges = sum(d) // 2 by the
    handshake lemma."""
    import pandas as pd

    from .exchange import hash_partitioned_agg

    weights = _distinct_pair_weights(lineitem_ds, num_partitions)

    def node_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        nodes = pd.concat([df["a"], df["b"]], ignore_index=True)
        vc = nodes.value_counts()
        return pd.DataFrame({"node": vc.index.to_numpy().astype("int64"),
                             "d": vc.to_numpy().astype("int64")})

    degrees = hash_partitioned_agg(
        weights.map_batches(node_partial, batch_format="pandas"),
        ["node"],
        lambda df: df.groupby("node", sort=False, as_index=False).agg(
            d=("d", "sum")),
        num_partitions)

    def moment_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        d = df["d"].to_numpy()
        return pd.DataFrame(
            {"k": np.int64(0), "n_nodes": np.int64(len(d)),
             "sum_d": d.sum(dtype=np.int64),
             "n_wedges": (d * (d - 1) // 2).sum(dtype=np.int64),
             "max_deg": np.int64(d.max()) if len(d) else np.int64(0)},
            index=[0])

    folded = hash_partitioned_agg(
        degrees.map_batches(moment_partial, batch_format="pandas"),
        ["k"],
        lambda df: df.groupby("k", sort=False, as_index=False).agg(
            n_nodes=("n_nodes", "sum"), sum_d=("sum_d", "sum"),
            n_wedges=("n_wedges", "sum"), max_deg=("max_deg", "max")),
        num_partitions)

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.copy()
        df["n_edges"] = df["sum_d"] // 2
        return df[["n_nodes", "n_edges", "n_wedges", "max_deg"]]

    return folded.map_batches(finish, batch_format="pandas")


def sql_degree_moments() -> str:
    """DuckDB oracle: same graph, moments straight off the degree CTE."""
    return """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL
), e AS (
  SELECT DISTINCT x.s AS a, y.s AS b
  FROM ls x JOIN ls y ON x.o = y.o AND x.s < y.s
), und AS (
  SELECT a AS node, b AS other FROM e
  UNION ALL SELECT b AS node, a AS other FROM e
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY node
)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(d) // 2 AS BIGINT) AS n_edges,
       CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges,
       CAST(max(d) AS BIGINT) AS max_deg
FROM deg
"""


def sql_edge_weights() -> str:
    """DuckDB oracle: distinct (order, supplier) pairs self-joined within
    the order, counted per pair, histogrammed per weight."""
    return """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem
), ew AS (
  SELECT x.s AS a, y.s AS b, CAST(count(*) AS BIGINT) AS w
  FROM ls x JOIN ls y ON x.o = y.o AND x.s < y.s
  GROUP BY 1, 2
)
SELECT w AS weight, CAST(count(*) AS BIGINT) AS n_edges
FROM ew GROUP BY 1
"""
