"""Config validation (reference test strategy: tests/test_config.py —
loader dot-path behavior, required fields and types per YAML, cross-file
consistency)."""

from __future__ import annotations

from pathlib import Path

import pytest
import yaml

from kgx import config_loader

CONFIG_DIR = Path(__file__).resolve().parent.parent / "config"


class TestLoader:
    def test_dot_path_get(self):
        assert config_loader.get("processing", "segment.target_chars") == 200
        assert config_loader.get("processing", "no.such.path", 42) == 42

    def test_cache_and_reload(self):
        a = config_loader.load("processing")
        assert config_loader.load("processing") is a  # cached object
        config_loader.reload()
        b = config_loader.load("processing")
        assert b == a and b is not a

    def test_override_chain(self):
        cfg = config_loader.resolve_settings(
            preset="news", overrides={"processing": {"segment": {"target_chars": 999}}}
        )
        # CLI override > preset (300) > default (200)
        assert cfg["processing"]["segment"]["target_chars"] == 999
        # preset wins where no CLI override
        assert cfg["processing"]["segment"]["novelty_threshold"] == 0.90


class TestRequiredFields:
    def test_processing(self):
        p = config_loader.load("processing")
        seg = p["segment"]
        assert isinstance(seg["target_chars"], int) and seg["target_chars"] > 0
        assert isinstance(seg["max_chars"], int) and seg["max_chars"] >= seg["target_chars"]
        assert 0.0 < seg["novelty_threshold"] <= 1.0
        lk = p["linker"]
        assert abs(lk["w_alias"] + lk["w_embed"] + lk["w_ctx"] - 1.0) < 1e-9
        d = p["dedup"]
        assert d["minhash_num_perm"] % d["minhash_bands"] == 0
        assert d["simhash_max_hamming"] <= 3  # pigeonhole bound for 4 bands

    def test_filters(self):
        f = config_loader.load("filters")
        for key in ("junk_patterns", "filler_patterns", "stop_words"):
            assert isinstance(f[key], list) and all(isinstance(x, str) for x in f[key])
        assert all(p == p.lower() for p in f["junk_patterns"])  # matched lowercase

    def test_categories_cross_consistency(self):
        c = config_loader.load("categories")
        order = c["order"]
        assert order[-1] == "general"  # fallback must be last
        assert len(order) == len(set(order))
        # every keyworded category appears in the order list (reference
        # cross-file check: order ⊆ titles, test_config.py:155-167)
        assert set(c["keywords"]) <= set(order)

    def test_predicates(self):
        r = config_loader.load("rules/predicates")
        assert isinstance(r["predicates"], list) and r["predicates"]
        for rule in r["predicates"]:
            assert set(rule) >= {"phrase", "pred", "conf"}
            assert 0.0 < rule["conf"] <= 1.0
        phrases = [x["phrase"].lower() for x in r["predicates"]]
        assert len(phrases) == len(set(phrases))

    def test_profiles_reference_valid_presets(self):
        profs = config_loader.load("profiles")
        preset_names = {p.stem for p in (CONFIG_DIR / "presets").glob("*.yaml")}
        for name, prof in profs.items():
            preset = prof.get("preset")
            assert preset is None or preset in preset_names, name

    def test_all_yaml_files_loadable(self):
        for f in CONFIG_DIR.rglob("*.yaml"):
            with open(f, encoding="utf-8") as fh:
                assert yaml.safe_load(fh) is not None, f

    def test_presets_touch_only_known_keys(self):
        base = config_loader.resolve_settings()

        def known(path, node, base_node):
            if not isinstance(node, dict):
                return
            for k, v in node.items():
                assert k in base_node, f"preset key {path}.{k} not in defaults"
                if isinstance(base_node[k], dict):
                    known(f"{path}.{k}", v, base_node[k])

        for f in (CONFIG_DIR / "presets").glob("*.yaml"):
            with open(f, encoding="utf-8") as fh:
                known(f.stem, yaml.safe_load(fh), base)
