"""Property-based tests (hypothesis) over the pure shared functions — the
invariants the distributed engine's correctness rests on.  The reference has
no property tests (SURVEY.md §5); these guard the properties the Ray
pipeline EXPLOITS: idempotent normalization, span-cover segmentation,
associative/commutative merges, bounded similarity measures, codec
roundtrips."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgx.functions import text as T
from kgx.functions.pipeline_core import merge_entity_group, merge_triple_group
from kgx.stages.multimodal import decode_payload, encode_payload

texts = st.text(max_size=400)
small_texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=200
)


class TestNormalization:
    @given(texts)
    def test_normalize_ws_idempotent(self, s):
        once = T.normalize_ws(s)
        assert T.normalize_ws(once) == once

    @given(texts)
    def test_extract_html_never_raises_and_is_normalized(self, s):
        out = T.extract_text_from_html(s.encode("utf-8", "ignore"))
        assert out == T.normalize_ws(out)

    @given(texts)
    def test_entity_key_idempotent(self, s):
        k = T.normalize_entity_key(s)
        assert T.normalize_entity_key(k) == k

    @given(texts)
    def test_triple_part_idempotent(self, s):
        k = T.normalize_triple_part(s)
        assert T.normalize_triple_part(k) == k


class TestSegmentation:
    @given(small_texts, st.integers(20, 100), st.integers(100, 300))
    def test_spans_ordered_bounded_nonoverlapping(self, s, target, max_chars):
        spans = T.segment_spans(s, target, max_chars)
        prev_end = 0
        for b, e in spans:
            assert 0 <= b < e <= len(s)
            assert b >= prev_end  # ordered, non-overlapping
            assert e - b <= max_chars
            assert s[b:e].strip()
            prev_end = e

    @given(small_texts)
    def test_nonblank_text_is_covered(self, s):
        spans = T.segment_spans(s, 50, 100)
        covered = "".join(s[b:e] for b, e in spans)
        # dropped chars are whitespace-only trailing bits
        assert T.normalize_ws(covered) == T.normalize_ws(s) or not s.strip()


class TestSimilarity:
    sets = st.sets(st.text(max_size=6), max_size=30)

    @given(sets, sets)
    def test_jaccard_bounds_and_symmetry(self, a, b):
        j = T.jaccard(a, b)
        assert 0.0 <= j <= 1.0
        assert j == T.jaccard(b, a)
        assert T.jaccard(a, a) == 1.0

    @given(texts)
    def test_simhash_self_distance_zero(self, s):
        assert T.hamming64(T.simhash64(s), T.simhash64(s)) == 0

    @given(st.text(max_size=100))
    def test_shingle_codes_unique_and_sorted(self, s):
        codes = T.shingle_codes(s)
        assert list(codes) == sorted(set(codes.tolist()))

    @given(st.text(min_size=5, max_size=100))
    @settings(max_examples=30)
    def test_minhash_identical_inputs_agree(self, s):
        c = T.shingle_codes(s)
        if len(c):
            a = T.minhash_from_codes(c)
            b = T.minhash_from_codes(T.shingle_codes(s))
            assert (a == b).all()


def _mention(key, eid, name, surface, url, seg):
    return {"entity_key": key, "entity_id": eid, "canonical_name": name,
            "surface": surface, "url": url, "seg_id": seg}


class TestMergeAlgebra:
    ments = st.lists(
        st.builds(
            _mention,
            st.just("k"),
            st.integers(-1, 5),
            st.text(min_size=1, max_size=8),
            st.text(min_size=1, max_size=8),
            st.text(min_size=1, max_size=6),
            st.integers(0, 9),
        ),
        min_size=1,
        max_size=8,
    )

    @given(ments, st.randoms())
    def test_entity_merge_order_free(self, rows, rnd):
        base = merge_entity_group(rows)
        shuffled = list(rows)
        rnd.shuffle(shuffled)
        assert merge_entity_group(shuffled) == base

    @given(ments, st.integers(1, 3))
    def test_entity_merge_associative_via_partials(self, rows, cut):
        """merge(all) == merge(merge(part1) + merge(part2)) — the property
        the salted two-phase canonicalization shuffle relies on."""
        k = max(1, min(cut, len(rows) - 1)) if len(rows) > 1 else 1
        full = merge_entity_group(rows)
        if len(rows) == 1:
            return
        p1 = dict(merge_entity_group(rows[:k]))
        p2 = dict(merge_entity_group(rows[k:]))
        for p in (p1, p2):
            p["url"], p["seg_id"] = p.pop("first_url"), p.pop("first_seg_id")
        two_phase = merge_entity_group([p1, p2])
        assert two_phase == full

    triples = st.lists(
        st.fixed_dictionaries(
            {
                "subj": st.text(min_size=1, max_size=6),
                "pred": st.just("p"),
                "obj": st.text(min_size=1, max_size=6),
                "url": st.text(min_size=1, max_size=6),
                "seg_id": st.integers(0, 9),
                "conf": st.floats(0.1, 1.0, allow_nan=False),
            }
        ),
        min_size=1,
        max_size=8,
    )

    @given(triples, st.randoms())
    def test_triple_merge_order_free(self, rows, rnd):
        base = merge_triple_group(rows)
        shuffled = list(rows)
        rnd.shuffle(shuffled)
        assert merge_triple_group(shuffled) == base


class TestPayloadCodec:
    @given(st.binary(max_size=500), st.integers(0, 65535), st.integers(0, 65535))
    def test_roundtrip(self, body, w, h):
        assert decode_payload(encode_payload(body, w, h)) == (w, h, len(body))

    @given(st.binary(max_size=50))
    def test_garbage_fails_open(self, junk):
        out = decode_payload(junk)
        assert out is None or junk[:4] == b"KX1\x00"


class TestRound2Properties:
    """Property tests for the round-2 operators: BPE tokenizer parity with
    DuckDB, repetition-stat parity, and sessionization kernel vs a serial
    brute force."""

    ascii_texts = st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=120,
    )

    @settings(max_examples=60, deadline=None)
    @given(ascii_texts)
    def test_bpe_count_python_equals_duckdb(self, s):
        import duckdb

        from kgx.functions import textstats as ts

        con = duckdb.connect()
        got = con.execute(f"select {ts.sql_n_bpe_tokens('?')}", [s]).fetchone()[0]
        assert int(got) == ts.n_bpe_tokens(s), repr(s)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.sampled_from("aa bb cc dd ee".split()), max_size=30))
    def test_repetition_python_equals_duckdb(self, words):
        import duckdb

        from kgx.functions import textstats as ts

        text = " ".join(words)
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO documents VALUES (0, ?)", [text])
        row = con.execute(ts.sql_repetition("coalesce(text,'')")).fetchone()
        want = ts.repetition_row(text)
        assert (row[1], row[2], row[3]) == (
            want["n_tri"], want["n_uniq"], want["rep_pass"]
        ), text

    def _brute_sessions(self, events, gap_us):
        by_user = {}
        for eid, ts_us, uid in events:
            by_user.setdefault(uid, []).append((ts_us, eid))
        out = []
        for uid, evs in by_user.items():
            evs.sort()
            cur = None
            for ts_us, _ in evs:
                if cur is None or ts_us - cur[-1] > gap_us:
                    if cur:
                        out.append((uid, cur[0], len(cur)))
                    cur = [ts_us]
                else:
                    cur.append(ts_us)
            if cur:
                out.append((uid, cur[0], len(cur)))
        return sorted(out)

    @settings(max_examples=10, deadline=None)
    @given(
        raw=st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 10_000)),
            min_size=1, max_size=60, unique=True,
        )
    )
    def test_sessionize_matches_brute_force(self, tmp_path_factory, ray_session, raw):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgx.pipelines.relational import sessionize_events

        gap_min = 1  # 60s gap on a seconds-scale synthetic stream
        events = [
            (i, ts_s * 1_000_000, uid) for i, (uid, ts_s) in enumerate(raw)
        ]
        tbl = pa.table(
            {
                "event_id": [e[0] for e in events],
                "ts": pa.array([e[1] for e in events], type=pa.timestamp("us")),
                "user_id": [e[2] for e in events],
            }
        )
        d = tmp_path_factory.mktemp("sess")
        pq.write_table(tbl, d / "events.parquet")
        out = sessionize_events(str(d), gap_minutes=gap_min).to_pandas()
        got = sorted(
            (int(r.user_id), int(r.session_start_us), int(r.n_events))
            for r in out.itertuples()
        )
        assert got == self._brute_sessions(events, gap_min * 60 * 1_000_000)
