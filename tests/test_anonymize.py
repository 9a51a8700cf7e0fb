"""Anonymizer (M9 semantics): regex masking parity, right-to-left PERSON
replacement via the broadcast alias dict, scalar/batch agreement."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from kgx import config_loader, synth
from kgx.stages import anonymize as A


class TestRegexMasking:
    def test_email_phone_terms(self):
        s = ("Mail jane.smith@acme.example or call 555-123-4567 about "
             "Project Kingfisher today")
        out = A.mask_regex_pii(s, ["project kingfisher"])
        assert "[EMAIL]" in out and "jane.smith" not in out
        assert "[PHONE]" in out and "555-123-4567" not in out
        assert "[REDACTED]" in out and "Kingfisher" not in out

    def test_batch_matches_scalar(self):
        terms = config_loader.load("anonymize")["custom_terms"]
        texts = [
            "a@b.co and 111-222-3333",
            "no pii here",
            "",
            None,
            "CODENAME AURORA briefing",
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = A.mask_pii_batch(df, terms)
        for _, r in out.iterrows():
            t = texts[int(r.doc_id)]
            assert r.clean_text == A.mask_regex_pii(t or "", terms)


class TestPersonMasker:
    def test_person_aliases_masked(self, ray_session, kb):
        import ray

        alias_ref = ray.put(kb["alias_table"].to_pylist())
        masker = A.PersonMasker(alias_ref, custom_terms=[])
        person = next(
            e["canonical_name"] for e in kb["entities"] if e["ner_type"] == "PER"
        )
        org = next(
            e["canonical_name"] for e in kb["entities"] if e["ner_type"] == "ORG"
        )
        out = masker.mask(f"{person} met {person} at {org}.")
        assert out.count("[PERSON]") == 2
        assert person not in out
        assert org in out  # ORG mentions are NOT masked

    def test_stage_on_pages(self, ray_session, kb):
        import ray
        import ray.data as rd

        alias_ref = ray.put(kb["alias_table"].to_pylist())
        pages = pa.table(
            {
                "url": ["u1"],
                "text": ["Contact Jane at jane@x.example or 555-123-4567."],
            }
        )
        out = (
            rd.from_arrow(pages)
            .map_batches(
                A.PersonMasker,
                fn_constructor_kwargs={"alias_ref": alias_ref, "custom_terms": []},
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
        )
        assert "[EMAIL]" in out.text[0] and "[PHONE]" in out.text[0]


class TestClusterStage:
    def test_clusters_match_pairs(self, ray_session):
        import ray.data as rd

        from kgx.stages.cluster import cluster_ids, dedup_representatives

        docs = pa.table(
            {"doc_id": [1, 2, 3, 4, 5], "text": ["x"] * 5},
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        )
        pairs = pa.table(
            {"id_a": [1, 2, 4], "id_b": [2, 3, 5]},
            schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
        )
        got = (
            cluster_ids(rd.from_arrow(docs), rd.from_arrow(pairs))
            .to_pandas()
            .set_index("doc_id")["cluster_id"]
            .to_dict()
        )
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
        reps = set(
            dedup_representatives(rd.from_arrow(docs), rd.from_arrow(pairs))
            .to_pandas()["doc_id"]
        )
        assert reps == {1, 4}

    def test_label_propagation_equals_union_find(self, ray_session):
        import ray.data as rd

        from kgx.stages.cluster import _components, label_propagation_labels

        # chain 1-2-3-4, triangle 10-11-12 + bridge 12-13, singleton pair 20-21
        pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
                 (12, 13), (20, 21)]
        tab = pa.table(
            {"id_a": [a for a, _ in pairs], "id_b": [b for _, b in pairs]},
            schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
        )
        distributed = label_propagation_labels(rd.from_arrow(tab))
        serial = _components(pairs)
        assert distributed == serial
        assert distributed[4] == 1 and distributed[13] == 10
