"""Wide (shuffle) stages: salted entity canonicalization, exact triple
dedup + categorization, and adjacency grouping.

These are the all-to-all exchanges of the pipeline (SURVEY.md §2 G2/G4/O3).
Skew strategy: head entity keys (popular orgs — in the synthetic corpus one
ORG receives ~30% of subject mentions) are handled with a SALTED two-phase
aggregate: phase 1 groups on (entity_key, salt) where salt is derived from
the row's lineage, producing one partial row per (key, salt); phase 2 groups
the tiny partial set on entity_key alone.  The merge function is associative
and commutative (kgx.functions.pipeline_core.merge_entity_group), so the
two-phase result equals the serial oracle's single-pass result exactly.

The same partial/final pattern pre-shrinks the exact-dedup shuffle: most
duplicate (s,p,o) rows collapse inside ``map_batches`` before any data moves.
"""

from __future__ import annotations

import pyarrow as pa

from .. import schema as S
from ..functions.pipeline_core import (
    adjacency_rows,
    categorize_triple,
    mention_rows_from_linked,
    merge_entity_group,
    merge_triple_group,
    triple_dedup_key,
)
from ..functions.text import stable_hash64
from .kg_stages import _rows_to_table

_PARTIAL_ENTITY = pa.schema(
    [
        pa.field("entity_key", pa.string()),
        pa.field("salt", pa.int32()),
        pa.field("entity_id", pa.int64()),
        pa.field("canonical_name", pa.string()),
        pa.field("aliases", pa.list_(pa.string())),
        pa.field("n_mentions", pa.int64()),
        pa.field("url", pa.string()),       # min-lineage carrier for re-merge
        pa.field("seg_id", pa.int32()),
    ]
)


def explode_and_partial_merge_entities(batch: pa.Table, salt_buckets: int) -> pa.Table:
    """linked triples -> partially merged entity rows, salted.

    Combines the explode (2 mention rows per triple) and the within-batch
    partial merge so the shuffle input is already one row per
    (entity_key, salt) per batch — the combiner that keeps the canonicalize
    groupby from moving every mention row.
    """
    groups: dict[tuple[str, int], list[dict]] = {}
    for m in mention_rows_from_linked(batch.to_pylist()):
        salt = stable_hash64(f"{m['url']}|{m['seg_id']}") % salt_buckets
        groups.setdefault((m["entity_key"], salt), []).append(m)
    rows = []
    for (key, salt), ms in groups.items():
        merged = merge_entity_group(ms)
        rows.append(
            {
                "entity_key": key,
                "salt": salt,
                "entity_id": merged["entity_id"],
                "canonical_name": merged["canonical_name"],
                "aliases": merged["aliases"],
                "n_mentions": merged["n_mentions"],
                "url": merged["first_url"],
                "seg_id": merged["first_seg_id"],
            }
        )
    return _rows_to_table(rows, _PARTIAL_ENTITY)


def final_merge_entity_group(group: pa.Table) -> pa.Table:
    rows = group.to_pylist()
    for r in rows:  # partial rows carry min-lineage in url/seg_id
        r.setdefault("url", r.get("url"))
    merged = merge_entity_group(rows)
    return _rows_to_table([merged], S.ENTITIES)


def canonical_entities(linked_ds, cfg: dict):
    """ray.data.Dataset[LINKED_FULL] -> Dataset[ENTITIES] via the salted
    two-phase groupby described in the module docstring."""
    salt_buckets = cfg["processing"]["canonicalize"]["salt_buckets"]
    partial = linked_ds.map_batches(
        lambda b: explode_and_partial_merge_entities(b, salt_buckets),
        batch_format="pyarrow",
    )
    # Phase 1 shuffle on the salted key: heavy keys spread over salt_buckets.
    phase1 = partial.groupby(["entity_key", "salt"]).map_groups(
        final_merge_to_partial, batch_format="pyarrow"
    )
    # Phase 2: at most salt_buckets rows per key remain.
    return phase1.groupby("entity_key").map_groups(
        final_merge_entity_group, batch_format="pyarrow"
    )


def final_merge_to_partial(group: pa.Table) -> pa.Table:
    rows = group.to_pylist()
    merged = merge_entity_group(rows)
    out = {
        "entity_key": merged["entity_key"],
        "salt": rows[0]["salt"],
        "entity_id": merged["entity_id"],
        "canonical_name": merged["canonical_name"],
        "aliases": merged["aliases"],
        "n_mentions": merged["n_mentions"],
        "url": merged["first_url"],
        "seg_id": merged["first_seg_id"],
    }
    return _rows_to_table([out], _PARTIAL_ENTITY)


# ---------------------------------------------------------------------------
# Exact triple dedup + categorize
# ---------------------------------------------------------------------------

_PARTIAL_TRIPLE = pa.schema(
    [
        pa.field("dkey", pa.string()),
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("url", pa.string()),
        pa.field("seg_id", pa.int32()),
        pa.field("conf", pa.float32()),
        pa.field("n_support", pa.int64()),
    ]
)


def partial_dedup_triples(batch: pa.Table) -> pa.Table:
    """Within-batch combiner for the exact-dedup shuffle (G4/D3): collapse
    duplicate normalized (s,p,o) before any row leaves the task."""
    groups: dict[tuple, list[dict]] = {}
    for t in batch.to_pylist():
        groups.setdefault(triple_dedup_key(t), []).append(t)
    rows = []
    for key, ts in groups.items():
        merged = merge_triple_group(ts)
        merged["dkey"] = "\x1f".join(key)
        rows.append(merged)
    return _rows_to_table(rows, _PARTIAL_TRIPLE)


def dedup_and_categorize(linked_ds, cfg: dict):
    """Dataset[LINKED_FULL] -> Dataset[TRIPLES]: partial dedup per batch,
    final dedup per dkey group, then keyword-argmax categorization (G3) with
    the broadcast keyword dict in the task closure."""
    cat_order = cfg["categories"]["order"]
    cat_kw = cfg["categories"]["keywords"]

    def finalize_group(group: pa.Table) -> pa.Table:
        merged = merge_triple_group(group.to_pylist())
        merged["category"] = categorize_triple(merged, cat_order, cat_kw)
        return _rows_to_table([merged], S.TRIPLES)

    partial = linked_ds.map_batches(partial_dedup_triples, batch_format="pyarrow")
    return partial.groupby("dkey").map_groups(finalize_group, batch_format="pyarrow")


def adjacency_from_triples(triples_ds):
    """Dataset[TRIPLES] -> Dataset[ADJACENCY]: grouped edges per subject with
    deterministic (obj, pred) ordering (O3 sorted graph materialization)."""

    def per_subj(group: pa.Table) -> pa.Table:
        rows = adjacency_rows(group.to_pylist())
        return _rows_to_table(rows, S.ADJACENCY)

    return triples_ds.groupby("subj").map_groups(per_subj, batch_format="pyarrow")
