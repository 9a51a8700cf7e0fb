"""Serial reference implementation of the whole KG pipeline.

Plain single-process Python over ``list[dict]`` records — the same execution
style as the reference engine (SURVEY.md §1: row-oriented, in-memory, batch)
— composed from the shared pure functions in ``kgx.functions``.  The Ray
pipeline's output must match this oracle's output: byte-identical extracted
text per url, P/R >= 0.95 on normalized (subj, pred, obj) (BASELINE.json).
No Ray imports here.
"""

from __future__ import annotations

import pyarrow as pa

from . import schema as S
from .functions.extract_kg import AliasMatcher, PredicateMatcher
from .functions.pipeline_core import (
    adjacency_rows,
    categorize_triple,
    link_raw_triple,
    mention_rows_from_linked,
    mentions_for_segment,
    merge_entity_group,
    merge_triple_group,
    raw_triples_for_segment,
    segments_for_page,
    segments_for_page_adaptive,
    triple_dedup_key,
)
from .functions.text import page_text


def _pages_rows(pages: pa.Table) -> list[dict]:
    return pages.to_pylist()


def extract_text(pages: pa.Table) -> pa.Table:
    rows = [{"url": r["url"], "text": page_text(r["html"], r["text"])}
            for r in _pages_rows(pages)]
    return pa.table(
        {"url": [r["url"] for r in rows], "text": [r["text"] for r in rows]},
        schema=pa.schema([("url", pa.string()), ("text", pa.string())]),
    )


def run(pages: pa.Table, cfg: dict, kb: dict) -> dict[str, pa.Table]:
    """Full serial pipeline: pages -> {text, segments, mentions, triples,
    entities, adjacency} tables, with globally deterministic ordering."""
    aliases = AliasMatcher(kb["alias_table"].to_pylist())
    predicates = PredicateMatcher(cfg["rules"]["predicates"])
    embeddings = {
        r["entity_id"]: r["embedding"] for r in kb["embedding_table"].to_pylist()
    }

    pl = cfg.get("pipeline", {})
    drop_lang = bool(pl.get("drop_non_target_lang"))
    target_lang = pl.get("target_lang", "en")
    masker = None
    if pl.get("anonymize"):
        from .stages.anonymize import PersonMasker

        masker = PersonMasker(
            kb["alias_table"].to_pylist(),
            cfg.get("anonymize", {}).get("custom_terms", []),
        )

    text_rows: list[dict] = []
    seg_rows: list[dict] = []
    mention_rows: list[dict] = []
    linked: list[dict] = []
    for page in _pages_rows(pages):
        if drop_lang and page["lang"] != target_lang:
            continue
        ptext, segs = segments_for_page_adaptive(
            page["url"], page["html"], page["text"], page["lang"], cfg
        )
        text_rows.append({"url": page["url"], "text": ptext})
        if masker is not None:
            for seg in segs:
                seg["text"] = masker.mask(seg["text"])
        for seg in segs:
            seg_rows.append(seg)
            mention_rows.extend(mentions_for_segment(seg, aliases))
            for raw in raw_triples_for_segment(seg, aliases, predicates, cfg):
                linked.append(link_raw_triple(raw, aliases, embeddings, cfg))

    # Global: canonical entities (G2 merge, order-free).
    by_key: dict[str, list[dict]] = {}
    for m in mention_rows_from_linked(linked):
        by_key.setdefault(m["entity_key"], []).append(m)
    entities = [merge_entity_group(rows) for key, rows in sorted(by_key.items())]

    # Global: exact triple dedup (G4/D3) + categorize (G3).
    by_triple: dict[tuple, list[dict]] = {}
    for t in linked:
        by_triple.setdefault(triple_dedup_key(t), []).append(t)
    cat_order = cfg["categories"]["order"]
    cat_kw = cfg["categories"]["keywords"]
    finals = []
    for key in sorted(by_triple):
        rep = merge_triple_group(by_triple[key])
        rep["category"] = categorize_triple(rep, cat_order, cat_kw)
        finals.append(rep)
    finals.sort(key=lambda t: (t["subj"], t["pred"], t["obj"]))

    adj = adjacency_rows(finals)

    def tbl(rows: list[dict], schema: pa.Schema) -> pa.Table:
        if not rows:
            return schema.empty_table()
        cols = {f.name: [r[f.name] for r in rows] for f in schema}
        return pa.table(cols, schema=schema)

    return {
        "text": pa.table(
            {"url": [r["url"] for r in text_rows], "text": [r["text"] for r in text_rows]}
        ),
        "segments": tbl(seg_rows, S.SEGMENTS),
        "mentions": tbl(mention_rows, S.MENTIONS),
        "triples": tbl(finals, S.TRIPLES),
        "entities": tbl(entities, S.ENTITIES),
        "adjacency": tbl(adj, S.ADJACENCY),
    }
