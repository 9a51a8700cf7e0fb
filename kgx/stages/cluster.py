"""Near-duplicate clustering: similarity pairs -> connected components ->
one cluster id (min member id) per document.

This is the union-find stage that SURVEY.md §7 adds on top of the pair
generators in ``kgx.stages.dedup`` (the scalable realization of the
reference's near-dup merge G2/D1/D2).  Strategy per SURVEY.md §7.4.4:

* The EDGE set is orders of magnitude smaller than the corpus (near-dup
  pairs above a high threshold), so edges are collected to the driver and
  union-found there; the labels dict then broadcasts back into a streaming
  ``map_batches`` over the full corpus.  Collecting the corpus is never
  required.
* At 10^12-doc scale where even edges overflow one machine, swap
  ``_components`` for alternating-rounds label propagation: iterate
  ``labels = min(labels, min over neighbors)`` as a repeated
  join+groupby-min over the edge Dataset until a fixpoint round changes
  nothing — same output (min reachable id), fully distributed.  The
  function signature and output schema stay as-is.
"""

from __future__ import annotations

import pyarrow as pa


def _components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find with path compression; label = min member id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def cluster_ids(docs_ds, pairs_ds):
    """(doc_id) x (id_a, id_b) -> (doc_id, cluster_id) for EVERY doc;
    singletons get cluster_id = doc_id."""
    import ray

    edges = [
        (r["id_a"], r["id_b"])
        for batch in pairs_ds.iter_batches(batch_size=None, batch_format="pyarrow")
        for r in batch.to_pylist()
    ]
    labels_ref = ray.put(_components(edges))

    def tag(batch: pa.Table) -> pa.Table:
        labels = ray.get(labels_ref)
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": ids,
                "cluster_id": [labels.get(d, d) for d in ids],
            },
            schema=pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]),
        )

    return docs_ds.select_columns(["doc_id"]).map_batches(tag, batch_format="pyarrow")


def label_propagation_labels(pairs_ds, max_rounds: int = 50) -> dict[int, int]:
    """Distributed alternating-rounds min-label propagation over the edge
    Dataset — the 10^12-scale fallback documented on ``_components``:
    every round, each node's label becomes ``min(own, labels of neighbors)``
    expressed entirely as Dataset ops (flat-map to messages, groupby-min);
    converges in <= diameter rounds, checked by a per-round changed-count.

    Returns the same ``{node: min reachable id}`` dict as union-find (only
    non-singleton nodes appear), so the two backends are interchangeable —
    tests assert equality.  The driver only ever sees per-round aggregate
    counts and the final (small) non-trivial label set.
    """
    import pyarrow.compute as pc

    def to_messages(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        la = batch["label_a"].to_pylist()
        lb = batch["label_b"].to_pylist()
        # each endpoint offers its label to the other AND keeps its own
        return pa.table(
            {
                "node": a + b + a + b,
                "label": lb + la + la + lb,
            },
            schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        )

    def min_label(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": [group["node"][0].as_py()],
                "label": [pc.min(group["label"]).as_py()],
            },
            schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        )

    # labels start as identity; carried as columns on the edge rows so each
    # round is: annotate edges with current labels -> messages -> groupby-min
    edges = pairs_ds.map_batches(
        lambda b: pa.table(
            {
                "id_a": b["id_a"],
                "id_b": b["id_b"],
                "label_a": b["id_a"],
                "label_b": b["id_b"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    labels: dict[int, int] = {}
    for _ in range(max_rounds):
        new_labels_ds = (
            edges.map_batches(to_messages, batch_format="pyarrow")
            .groupby("node")
            .map_groups(min_label, batch_format="pyarrow")
        )
        new_labels = {
            r["node"]: r["label"]
            for batch in new_labels_ds.iter_batches(batch_size=None, batch_format="pyarrow")
            for r in batch.to_pylist()
        }
        if new_labels == labels:
            break
        labels = new_labels
        import ray

        lbl_ref = ray.put(labels)

        def annotate(batch: pa.Table) -> pa.Table:
            cur = ray.get(lbl_ref)
            a = batch["id_a"].to_pylist()
            b = batch["id_b"].to_pylist()
            return pa.table(
                {
                    "id_a": a,
                    "id_b": b,
                    "label_a": [cur.get(x, x) for x in a],
                    "label_b": [cur.get(x, x) for x in b],
                },
                schema=pa.schema(
                    [("id_a", pa.int64()), ("id_b", pa.int64()),
                     ("label_a", pa.int64()), ("label_b", pa.int64())]
                ),
            )

        edges = edges.map_batches(annotate, batch_format="pyarrow").materialize()
    # match _components' shape exactly: only merged-away nodes (label != id)
    return {n: l for n, l in labels.items() if l != n}


def dedup_representatives(docs_ds, pairs_ds):
    """Keep one representative (min doc_id) per near-dup cluster — the
    near-dup analog of exact_dedup's per-group first."""
    clustered = cluster_ids(docs_ds, pairs_ds)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [d == c for d, c in zip(batch["doc_id"].to_pylist(),
                                    batch["cluster_id"].to_pylist())]
        )
        return batch.filter(mask)

    return clustered.map_batches(keep, batch_format="pyarrow")
