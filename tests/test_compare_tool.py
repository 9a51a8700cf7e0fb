"""Compare-tool verdict logic (reference G8 semantics,
compare_reports.py:173-345): delta math with zero-guards, ±10% quality
bands, verdict truth table, P/R join."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_spec = importlib.util.spec_from_file_location(
    "compare_outputs", Path(__file__).resolve().parent.parent / "scripts" / "compare_outputs.py"
)
C = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(C)


def _write_output_dir(root: Path, triples: list[dict], entities: int) -> str:
    t = pa.table(
        {
            "subj": [x["s"] for x in triples],
            "pred": [x["p"] for x in triples],
            "obj": [x["o"] for x in triples],
            "conf": [x.get("c", 0.9) for x in triples],
            "category": [x.get("cat", "general") for x in triples],
        }
    )
    (root / "triples").mkdir(parents=True)
    pq.write_table(t, root / "triples" / "part.parquet")
    e = pa.table({"entity_key": [f"e{i}" for i in range(entities)]})
    (root / "entities").mkdir(parents=True)
    pq.write_table(e, root / "entities" / "part.parquet")
    return str(root)


TRIPLES = [
    {"s": "Acme Corp", "p": "acquired", "o": "Globex Corp", "cat": "corporate_actions"},
    {"s": "Acme Corp", "p": "hired", "o": "Jane Smith", "cat": "people"},
    {"s": "Wayne Group", "p": "sued", "o": "Stark Labs", "cat": "legal"},
]


class TestCompare:
    def test_identical_is_unchanged(self, tmp_path):
        a = _write_output_dir(tmp_path / "a", TRIPLES, 3)
        b = _write_output_dir(tmp_path / "b", TRIPLES, 3)
        m = C.compare(a, b)
        assert m["verdict"] == "unchanged"
        assert m["triples_pr"]["precision"] == 1.0
        assert m["triples_pr"]["recall"] == 1.0
        assert not m["has_regressions"]

    def test_pr_is_case_and_punct_insensitive(self, tmp_path):
        a = _write_output_dir(tmp_path / "a", TRIPLES, 3)
        changed = [dict(t) for t in TRIPLES]
        changed[0]["s"] = "ACME CORP."  # normalizes to the same key
        b = _write_output_dir(tmp_path / "b", changed, 3)
        assert C.compare(a, b)["triples_pr"]["recall"] == 1.0

    def test_dropped_triples_regress(self, tmp_path):
        a = _write_output_dir(tmp_path / "a", TRIPLES, 3)
        b = _write_output_dir(tmp_path / "b", TRIPLES[:1], 3)
        m = C.compare(a, b)
        assert m["verdict"] in ("degraded", "mixed")
        assert m["has_regressions"]
        assert m["triples_pr"]["removed"] == 2

    def test_within_band_is_unchanged(self, tmp_path):
        # 3 -> 3 triples with tiny conf drift stays inside the ±10% band
        a = _write_output_dir(tmp_path / "a", TRIPLES, 3)
        drift = [dict(t, c=0.88) for t in TRIPLES]
        b = _write_output_dir(tmp_path / "b", drift, 3)
        assert C.compare(a, b)["verdict"] == "unchanged"

    def test_more_entities_improve(self, tmp_path):
        a = _write_output_dir(tmp_path / "a", TRIPLES, 3)
        b = _write_output_dir(tmp_path / "b", TRIPLES, 10)
        m = C.compare(a, b)
        assert m["verdict"] == "improved"
        assert any(i["metric"] == "n_entities" for i in m["improvements"])
