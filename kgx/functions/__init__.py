"""Pure, deterministic row-level functions shared by the Ray pipeline and the
serial oracle (kgx.oracle).  Everything in this package is plain Python /
numpy with NO Ray dependency, so the conformance gates (byte-identical
extracted text per url, P/R >= 0.95 on (subj, pred, obj)) compare the
*distributed execution* — partitioning, shuffle, merge order, dedup
tie-breaks — not incidental string-handling differences.
"""
