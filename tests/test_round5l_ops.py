"""Round-5 batch-24 operators: doc_quality_dup (quality x duplication
cross-tab) and text_tokenizer_fertility (per-language fertility counters) —
serial-parity + invariant tests."""

from __future__ import annotations

import pandas as pd


def _collect(ds) -> pd.DataFrame:
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


SF = "/root/testdata/sf0.001"


def _docs(sf: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()


def _score(text: str) -> int:
    from kgx.functions import textstats as ts

    q = ts.quality_row(text)
    return (int(q["n_tokens"] >= ts.QUALITY_MIN_TOKENS)
            + int(q["n_chars"] >= ts.QUALITY_MIN_CHARS)
            + int(ts.QUALITY_STOP_RATIO_DEN * q["n_stop"]
                  <= ts.QUALITY_STOP_RATIO_NUM * q["n_tokens"]))


# ---------------------------------------------------------------------------
# doc_quality_dup
# ---------------------------------------------------------------------------


def test_quality_dup_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.functions.text import md5_fingerprint

    out = _collect(Q.doc_quality_dup(SF)) \
        .sort_values(["score", "is_dup"]).reset_index(drop=True)

    docs = _docs(SF).dropna(subset=["doc_id"])
    fps = docs["text"].fillna("").map(md5_fingerprint)
    sizes = fps.map(fps.value_counts())
    cells: dict[tuple, int] = {}
    for text, sz in zip(docs["text"].fillna(""), sizes):
        key = (_score(text), int(sz > 1))
        cells[key] = cells.get(key, 0) + 1
    ref = pd.DataFrame([(s, d, n) for (s, d), n in sorted(cells.items())],
                       columns=["score", "is_dup", "n_docs"]).astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    assert out["n_docs"].sum() == len(docs)


def test_quality_dup_planted(ray_session):
    """Planted corpus: an exact pair of duplicates must land in is_dup=1
    regardless of batch boundaries."""
    import ray.data as rd

    from kgx.stages.corpus import quality_dup_matrix

    texts = ["the cat sat on the mat with a hat for it was flat " * 3] * 2 \
        + ["completely unique document number one about graphs and rays "
           "with enough tokens to pass every quality rule easily today"]
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts})
    out = _collect(quality_dup_matrix(rd.from_pandas(docs, override_num_blocks=3)))
    dup_mass = int(out.loc[out["is_dup"] == 1, "n_docs"].sum())
    assert dup_mass == 2
    assert int(out["n_docs"].sum()) == 3


# ---------------------------------------------------------------------------
# text_tokenizer_fertility
# ---------------------------------------------------------------------------


def test_fertility_matches_serial(ray_session):
    import kgx.queries as Q
    from kgx.functions import textstats as ts

    out = _collect(Q.text_tokenizer_fertility(SF)) \
        .sort_values("lang").reset_index(drop=True)

    docs = _docs(SF).dropna(subset=["doc_id"])
    cells: dict[str, list] = {}
    for text in docs["text"].fillna(""):
        lang = ts.predict_lang(text)
        c = cells.setdefault(lang, [0, 0, 0, 0])
        c[0] += 1
        c[1] += len(text)
        c[2] += ts.n_tokens(text)
        c[3] += ts.n_bpe_tokens(text)
    ref = pd.DataFrame(
        [(lang, *v) for lang, v in sorted(cells.items())],
        columns=["lang", "n_docs", "n_chars", "n_words", "n_bpe"])
    for c in ("n_docs", "n_chars", "n_words", "n_bpe"):
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
    # fertility is well-defined: BPE pre-tokens at least cover the words
    assert (out["n_bpe"] >= out["n_words"]).all()
    assert out["n_docs"].sum() == len(docs)
