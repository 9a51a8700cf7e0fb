"""YAML config loader with dot-path access and a process-local cache.

Inherits the reference's config surface (S8/R8: config/config_loader.py:25-116
— ``get(file, "a.b.c", default)``, cached, ``reload()``) — brand-new code.
Config is loaded ONCE on the driver and passed into stage constructors /
closures; actors never re-read YAML per batch (SURVEY.md §2.3 T6).
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any

import yaml

CONFIG_DIR = Path(__file__).resolve().parent.parent / "config"

_cache: dict[str, dict] = {}


def load(name: str, config_dir: Path | None = None) -> dict:
    """Load ``config/<name>.yaml`` (cached per absolute path)."""
    base = Path(config_dir) if config_dir else CONFIG_DIR
    path = str((base / f"{name}.yaml").resolve())
    if path not in _cache:
        with open(path, "r", encoding="utf-8") as f:
            _cache[path] = yaml.safe_load(f) or {}
    return _cache[path]


def get(name: str, dotted: str, default: Any = None, config_dir: Path | None = None) -> Any:
    """Dot-path lookup: ``get("processing", "segment.target_chars", 200)``."""
    node: Any = load(name, config_dir)
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node


def reload(name: str | None = None, config_dir: Path | None = None) -> None:
    """Drop the cache — whole cache, or one file when ``name`` is given
    (reference config_loader.py:84-94 per-file reload granularity)."""
    if name is None:
        _cache.clear()
        return
    base = Path(config_dir) if config_dir else CONFIG_DIR
    _cache.pop(str((base / f"{name}.yaml").resolve()), None)


def get_path(name: str, dotted: str, default: Any = None,
             config_dir: Path | None = None) -> str | None:
    """Path-valued lookup resolved to an absolute path: absolute values pass
    through, relative ones resolve against the project root (the config
    dir's parent) — reference config_loader.py:96-116 semantics."""
    val = get(name, dotted, default, config_dir)
    if val is None:
        return None
    p = Path(val)
    if p.is_absolute():
        return str(p)
    base = Path(config_dir) if config_dir else CONFIG_DIR
    return str((base.parent / p).resolve())


def _deep_merge(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def resolve_settings(
    preset: str | None = None,
    overrides: dict | None = None,
    config_dir: Path | None = None,
) -> dict:
    """Effective pipeline settings with the reference's override chain
    (extractor.py:65-97, run.py:131-156): CLI overrides > preset YAML >
    config defaults.  Returns one plain nested dict, safe to ship to actors.
    """
    base = {
        "processing": copy.deepcopy(load("processing", config_dir)),
        "filters": copy.deepcopy(load("filters", config_dir)),
        "categories": copy.deepcopy(load("categories", config_dir)),
        "rules": copy.deepcopy(load("rules/predicates", config_dir)),
        "pipeline": copy.deepcopy(load("settings", config_dir).get("pipeline", {})),
        "anonymize": copy.deepcopy(load("anonymize", config_dir)),
    }
    if preset:
        preset_cfg = load(f"presets/{preset}", config_dir)
        base = _deep_merge(base, preset_cfg)
    if overrides:
        base = _deep_merge(base, overrides)
    return base


def resolve_profile(
    name: str, overrides: dict | None = None, config_dir: Path | None = None
) -> dict:
    """Named profile -> effective settings (reference profiles.yaml:1-15:
    named bundles of backend + anonymization choices).  A profile is just a
    (preset, overrides) pair applied through the normal chain; explicit
    ``overrides`` still win."""
    prof = load("profiles", config_dir)[name]
    merged = _deep_merge(prof.get("overrides", {}), overrides or {})
    return resolve_settings(
        preset=prof.get("preset"), overrides=merged, config_dir=config_dir
    )
