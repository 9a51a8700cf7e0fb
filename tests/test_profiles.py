"""Named profiles (reference profiles.yaml analog) and the privacy profile's
in-pipeline anonymization: Ray pipeline must still match the serial oracle
with masking enabled, and PII must actually be gone."""

from __future__ import annotations

import pandas as pd

from kgx import config_loader


def test_profiles_resolve():
    default = config_loader.resolve_profile("default")
    assert not default.get("pipeline", {}).get("anonymize")
    privacy = config_loader.resolve_profile("privacy")
    assert privacy["pipeline"]["anonymize"] is True
    news = config_loader.resolve_profile("news_en")
    assert news["pipeline"]["drop_non_target_lang"] is True
    assert news["processing"]["segment"]["target_chars"] == 300  # from preset


def test_explicit_overrides_beat_profile():
    cfg = config_loader.resolve_profile(
        "privacy", overrides={"pipeline": {"anonymize": False}}
    )
    assert cfg["pipeline"]["anonymize"] is False


def test_privacy_profile_matches_oracle_and_scrubs(ray_session, pages_small, kb):
    import ray.data as rd

    from kgx import oracle, pipeline

    cfg = config_loader.resolve_profile("privacy")
    ora = oracle.run(pages_small, cfg, kb)
    outs = pipeline.kg_tables_in_memory(
        rd.from_arrow(pages_small), cfg, pipeline.broadcast_kb(kb)
    )
    a = (
        outs["triples"].to_pandas()
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    )
    b = (
        ora["triples"].to_pandas()
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # PERSON entities are masked before extraction -> no PER names survive
    per_names = {e["canonical_name"] for e in kb["entities"] if e["ner_type"] == "PER"}
    assert not (set(b["subj"]) | set(b["obj"])) & per_names
    # and the unmasked run DOES produce person triples (the gate is real)
    plain = oracle.run(pages_small, config_loader.resolve_profile("default"), kb)
    pb = plain["triples"].to_pandas()
    assert (set(pb["subj"]) | set(pb["obj"])) & per_names
