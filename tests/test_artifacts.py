"""Tests for the round-2 reference-parity artifacts: report.md +
metadata.json (generator.py:39-86 analog), compare-tool markdown
(compare_reports.py:348-446 analog), per-file config reload / get_path
(config_loader.py:84-116 analog), and the G6 adaptive segmentation.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_triples_hive(d: Path) -> None:
    for cat, rows in {
        "corporate_actions": [("Acme Corp", "acquired", "Globex Corp", 0.9),
                              ("Hooli Group", "merged_with", "Initech Labs", 0.95)],
        "general": [("Stark Systems", "supplies", "Wayne Corp", 0.8)],
    }.items():
        sub = d / f"category={cat}"
        sub.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "subj": [r[0] for r in rows],
                    "pred": [r[1] for r in rows],
                    "obj": [r[2] for r in rows],
                    "conf": pa.array([r[3] for r in rows], type=pa.float32()),
                }
            ),
            sub / "part-0.parquet",
        )


class TestReportWriter:
    def test_report_and_metadata(self, tmp_path):
        from kgx.report import write_report

        _write_triples_hive(tmp_path / "triples")
        manifest = {
            "run_id": "run-test",
            "counters": {"finalize": {
                "triples": 3, "entities": 5, "adjacency": 3, "linked": 7,
                "quality": {"by_category": {"corporate_actions": 2, "general": 1},
                            "general_ratio": 0.33, "avg_conf": 0.88},
            }},
        }
        path = write_report(tmp_path, manifest)
        md = path.read_text()
        assert md.startswith("# Knowledge Graph Report")
        assert "## Corporate Actions (2)" in md
        assert "## General (1)" in md
        assert "| Acme Corp | acquired | Globex Corp | 0.90 |" in md
        assert "## People" not in md  # empty categories skipped
        meta = json.loads((tmp_path / "metadata.json").read_text())
        assert meta["run_id"] == "run-test"
        assert meta["triples_count"] == 3
        assert meta["by_category"]["corporate_actions"] == 2

    def test_run_kg_writes_report(self, ray_session, tmp_path, cfg, kb):
        from kgx import synth
        from kgx.pipeline import run_kg, shard_pages_table_factory

        pages = synth.gen_pages(40, seed=7, kb=kb)
        run_kg(shard_pages_table_factory(pages), tmp_path, num_shards=2,
               cfg=cfg, kb=kb, run_id="r")
        assert (tmp_path / "report.md").exists()
        assert (tmp_path / "metadata.json").exists()
        assert "# Knowledge Graph Report" in (tmp_path / "report.md").read_text()


class TestCompareMarkdown:
    def test_markdown_structure(self):
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        from compare_outputs import to_markdown

        metrics = {
            "triples_pr": {"precision": 0.98, "recall": 0.97, "added": 3, "removed": 2},
            "old_quality": {"n_triples": 100, "avg_conf": 0.9, "general_ratio": 0.2},
            "new_quality": {"n_triples": 130, "avg_conf": 0.91, "general_ratio": 0.18},
            "improvements": [{"metric": "n_triples", "old": 100, "new": 130}],
            "regressions": [],
            "verdict": "improved",
            "has_regressions": False,
        }
        md = to_markdown(metrics, "/old", "/new")
        assert "# KG Output Comparison" in md
        assert "| Triples | 100 | 130 | +30 |" in md
        assert "## Overall Verdict ✅" in md
        assert "## Improvements ✅" in md
        assert "## Regressions" not in md


class TestConfigGranularity:
    def test_per_file_reload(self, tmp_path):
        import yaml

        from kgx import config_loader as cl

        (tmp_path / "a.yaml").write_text(yaml.dump({"x": 1}))
        (tmp_path / "b.yaml").write_text(yaml.dump({"y": 2}))
        assert cl.get("a", "x", config_dir=tmp_path) == 1
        assert cl.get("b", "y", config_dir=tmp_path) == 2
        (tmp_path / "a.yaml").write_text(yaml.dump({"x": 10}))
        (tmp_path / "b.yaml").write_text(yaml.dump({"y": 20}))
        cl.reload("a", config_dir=tmp_path)  # only a's cache entry dropped
        assert cl.get("a", "x", config_dir=tmp_path) == 10
        assert cl.get("b", "y", config_dir=tmp_path) == 2  # still cached
        cl.reload()
        assert cl.get("b", "y", config_dir=tmp_path) == 20

    def test_get_path(self, tmp_path):
        import yaml

        from kgx import config_loader as cl

        (tmp_path / "p.yaml").write_text(
            yaml.dump({"abs": "/usr/bin/x", "rel": "data/out"})
        )
        assert cl.get_path("p", "abs", config_dir=tmp_path) == "/usr/bin/x"
        rel = cl.get_path("p", "rel", config_dir=tmp_path)
        assert rel == str((tmp_path.parent / "data/out").resolve())
        assert cl.get_path("p", "missing", config_dir=tmp_path) is None


class TestAdaptiveSegmentation:
    def _cfg(self, cfg, **ad):
        import copy

        c = copy.deepcopy(cfg)
        c["processing"]["adaptive"] = {
            "enabled": True, "window": 4, "hi_keep_rate": 0.8,
            "lo_keep_rate": 0.3, "coarse_target_chars": 400,
            "coarse_max_chars": 800, **ad,
        }
        c["filters"]["junk_patterns"] = []
        c["processing"]["segment"]["novelty_threshold"] = 0.5
        c["processing"]["segment"]["target_chars"] = 200
        c["processing"]["segment"]["max_chars"] = 400
        return c

    def test_disabled_equals_plain(self, cfg):
        from kgx.functions.pipeline_core import (
            segments_for_page,
            segments_for_page_adaptive,
        )

        text = "Alpha beta gamma. " * 60
        a = segments_for_page_adaptive("u", None, text, "en", cfg)
        b = segments_for_page("u", None, text, "en", cfg)
        assert a == b

    def test_dense_page_switches_to_coarse(self, cfg):
        from kgx.functions.pipeline_core import segments_for_page_adaptive
        from kgx.functions.text import stable_hash64

        # fully novel text, no sentence bounds -> every chunk kept
        words = [f"w{stable_hash64(str(i)) % 10**9}" for i in range(2500)]
        text = " ".join(words)
        c = self._cfg(cfg)
        _, segs = segments_for_page_adaptive("u", None, text, "en", c)
        widths = [s["end"] - s["begin"] for s in segs]
        # first `window` candidates at fine width, then the coarse width
        assert widths[0] == 400
        assert widths[3] == 400
        assert widths[4] == 800  # switched after the analysis tick
        assert [s["seg_id"] for s in segs] == list(range(len(segs)))
        # offsets still index the page text exactly
        for s in segs:
            assert text[s["begin"]:s["end"]].strip() == s["text"]

    def test_hysteresis_switches_back_on_repetitive_tail(self, cfg):
        from kgx.functions.pipeline_core import segments_for_page_adaptive
        from kgx.functions.text import stable_hash64

        novel = " ".join(f"w{stable_hash64(str(i)) % 10**9}" for i in range(800))
        repetitive = " ".join("same words again and again" for _ in range(400))
        c = self._cfg(cfg)
        _, segs = segments_for_page_adaptive("u", None, novel + " " + repetitive, "en", c)
        widths = [s["end"] - s["begin"] for s in segs]
        assert 800 in widths  # went coarse on the novel head
        # repetitive tail drops below lo_keep_rate -> back to fine width for
        # any later kept segment (the first kept repetitive seg may be coarse)
        assert widths[-1] in (400, 800)  # smoke: no crash, spans valid
