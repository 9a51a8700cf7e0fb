"""Skew handling: the salted two-phase canonicalization (SURVEY.md §4.2 /
§7.4.3) must stay correct AND bounded when one entity key receives almost
all mentions (the head-entity hot key of the north rule)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from kgx.stages import wide
from kgx.functions.pipeline_core import merge_entity_group, mention_rows_from_linked


def skewed_linked(n: int = 20_000, head_frac: float = 0.9) -> pa.Table:
    """LINKED_FULL-shaped table where head_frac of subject mentions hit ONE
    entity key."""
    rows = {k: [] for k in (
        "url", "seg_id", "subj", "subj_key", "subj_id", "subj_surface",
        "pred", "obj", "obj_key", "obj_id", "obj_surface", "conf",
    )}
    for i in range(n):
        hot = i % 10 < int(head_frac * 10)
        subj = "Mega Corp" if hot else f"Tail Corp {i % 97}"
        key = "mega corp" if hot else f"tail corp {i % 97}"
        rows["url"].append(f"https://s.example/{i % 999}")
        rows["seg_id"].append(i % 7)
        rows["subj"].append(subj)
        rows["subj_key"].append(key)
        rows["subj_id"].append(0 if hot else 100 + i % 97)
        rows["subj_surface"].append(subj.lower() if i % 3 else subj)
        rows["pred"].append("supplies")
        rows["obj"].append(f"Obj {i % 53}")
        rows["obj_key"].append(f"obj {i % 53}")
        rows["obj_id"].append(1000 + i % 53)
        rows["obj_surface"].append(f"Obj {i % 53}")
        rows["conf"].append(0.9)
    t = pa.table(rows)
    return t.cast(
        pa.schema([(f.name, t.schema.field(f.name).type) for f in t.schema])
    )


@pytest.fixture(scope="module")
def linked_ds(ray_session):
    import ray.data as rd

    # many small blocks so the salted partial pass actually fans out
    return rd.from_arrow(skewed_linked()).repartition(16).materialize()


def serial_entities(tbl: pa.Table) -> dict[str, dict]:
    by_key: dict[str, list] = {}
    for m in mention_rows_from_linked(tbl.to_pylist()):
        by_key.setdefault(m["entity_key"], []).append(m)
    return {k: merge_entity_group(v) for k, v in by_key.items()}


def test_salted_canonicalization_correct_under_skew(ray_session, linked_ds, cfg):
    got = {
        r["entity_key"]: r
        for r in wide.canonical_entities(linked_ds, cfg).to_pandas().to_dict("records")
    }
    want = serial_entities(skewed_linked())
    assert set(got) == set(want)
    hot = got["mega corp"]
    assert hot["n_mentions"] == want["mega corp"]["n_mentions"] == 18_000
    assert hot["entity_id"] == 0
    assert sorted(hot["aliases"]) == want["mega corp"]["aliases"]
    # spot-check a tail key end-to-end too
    k = "tail corp 13"
    assert got[k]["n_mentions"] == want[k]["n_mentions"]


def test_salting_bounds_hot_key_partials(ray_session, linked_ds, cfg):
    """After the phase-1 salted merge, the hot key contributes at most
    salt_buckets rows to the final (unsalted) exchange — the skew bound."""
    salt_buckets = cfg["processing"]["canonicalize"]["salt_buckets"]
    phase1 = wide.canonical_phase1(linked_ds, cfg)
    counts: dict[str, int] = {}
    for batch in phase1.iter_batches(batch_size=None, batch_format="pyarrow"):
        for k in batch["entity_key"].to_pylist():
            counts[k] = counts.get(k, 0) + 1
    assert counts["mega corp"] <= salt_buckets
    assert max(counts.values()) <= salt_buckets
