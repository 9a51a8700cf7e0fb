"""Optional language gate (settings pipeline.drop_non_target_lang): off by
default, and when on, the Ray pipeline still matches the serial oracle."""

from __future__ import annotations

import pandas as pd


def test_lang_filter_matches_oracle(ray_session, pages_small, kb, cfg):
    import ray.data as rd

    from kgx import oracle, pipeline

    cfg2 = {**cfg, "pipeline": {"drop_non_target_lang": True, "target_lang": "en"}}
    ora = oracle.run(pages_small, cfg2, kb)
    outs = pipeline.kg_tables_in_memory(
        rd.from_arrow(pages_small), cfg2, pipeline.broadcast_kb(kb)
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
    # non-en pages exist in the fixture, so the gate must strictly shrink
    urls_kept = set(b["url"])
    langs = dict(zip(pages_small["url"].to_pylist(), pages_small["lang"].to_pylist()))
    assert all(langs[u] == "en" for u in urls_kept)


def test_default_off(cfg):
    assert not cfg.get("pipeline", {}).get("drop_non_target_lang")
