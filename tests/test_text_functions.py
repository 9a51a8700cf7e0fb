"""Unit tests for the pure text primitives (no Ray)."""

from __future__ import annotations

from kgx.functions import text as T


class TestExtractText:
    def test_strips_boilerplate_blocks(self):
        html = (
            b"<html><head><title>t</title><style>a{}</style></head>"
            b"<body><nav>MENU</nav><p>Hello world.</p>"
            b"<footer>FOOT</footer></body></html>"
        )
        assert T.extract_text_from_html(html) == "Hello world."

    def test_nested_drop_blocks(self):
        html = "<body><nav>a<nav>b</nav>c</nav><p>keep</p></body>"
        assert T.extract_text_from_html(html) == "keep"

    def test_entities_unescaped(self):
        assert T.extract_text_from_html("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"

    def test_none_and_bytes_and_str(self):
        assert T.extract_text_from_html(None) == ""
        assert T.extract_text_from_html("<p>x</p>") == "x"

    def test_multibyte_roundtrip(self):
        s = "Überraschung — 東京 привет"
        assert T.extract_text_from_html(f"<p>{s}</p>".encode()) == s

    def test_page_text_prefers_text_column(self):
        assert T.page_text(b"<p>html</p>", "direct  text") == "direct text"
        assert T.page_text(b"<p>html</p>", None) == "html"


class TestSegmentation:
    def test_offsets_cover_text(self):
        txt = "One sentence here. " * 40
        spans = T.segment_spans(txt.strip(), target_chars=60, max_chars=200)
        assert spans
        for b, e in spans:
            assert 0 <= b < e <= len(txt.strip())

    def test_long_run_hard_split(self):
        txt = "x" * 1000  # no sentence boundaries
        spans = T.segment_spans(txt, target_chars=100, max_chars=200)
        assert all(e - b <= 200 for b, e in spans)
        assert sum(e - b for b, e in spans) == 1000

    def test_empty(self):
        assert T.segment_spans("") == []

    def test_novelty_mask_keeps_first_and_novel(self):
        segs = ["alpha beta gamma", "alpha beta gamma", "totally different words"]
        assert T.novelty_keep_mask(segs, threshold=0.95) == [True, False, True]

    def test_junk_predicate(self):
        assert T.is_junk_segment("please ACCEPT ALL COOKIES now", ["accept all cookies"])
        assert not T.is_junk_segment("real content", ["accept all cookies"])


class TestSimilarityAndHashing:
    def test_jaccard_and_overlap(self):
        a, b = {"x", "y"}, {"y", "z"}
        assert T.jaccard(a, b) == 1 / 3
        assert T.overlap_asym(a, b) == 0.5
        assert T.overlap_asym(set(), b) == 0.0

    def test_stable_hash_is_stable(self):
        assert T.stable_hash64("abc") == T.stable_hash64("abc")
        assert T.stable_hash64("abc", seed=1) != T.stable_hash64("abc", seed=2)

    def test_minhash_similarity_tracks_jaccard(self):
        s1 = T.char_shingles("the quick brown fox jumps over the lazy dog")
        s2 = T.char_shingles("the quick brown fox jumped over the lazy dog")
        s3 = T.char_shingles("completely unrelated content about databases")
        m1, m2, m3 = (T.minhash_signature(s) for s in (s1, s2, s3))
        sim12 = sum(a == b for a, b in zip(m1, m2)) / len(m1)
        sim13 = sum(a == b for a, b in zip(m1, m3)) / len(m1)
        assert sim12 > 0.6 > sim13

    def test_simhash_near_duplicates_close(self):
        h1 = T.simhash64("the quick brown fox jumps over the lazy dog again and again")
        h2 = T.simhash64("the quick brown fox jumps over the lazy dog again and once")
        h3 = T.simhash64("select sum from table group by key order by value limit ten")
        assert T.hamming64(h1, h2) < T.hamming64(h1, h3)

    def test_hash_embed_normalized_and_deterministic(self):
        v = T.hash_embed(["alpha", "beta"], dim=16)
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9
        assert v == T.hash_embed(["alpha", "beta"], dim=16)

    def test_fingerprint_normalization(self):
        assert T.md5_fingerprint("A  b\tc") == T.md5_fingerprint("a b c")


class TestNormalization:
    def test_entity_key(self):
        assert T.normalize_entity_key("Acme-Corp 2024") == "acme corp"
        assert T.normalize_entity_key("ACME/corp") == "acme corp"

    def test_triple_part(self):
        assert T.normalize_triple_part("Acme, Corp!") == "acme corp"
