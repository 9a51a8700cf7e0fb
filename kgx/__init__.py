"""kgx — a Ray-Data-native knowledge-graph construction engine.

Built from scratch with the data-processing capabilities of
``rdwornik/corporate-knowledge-extractor`` (read-only reference at
/root/reference), re-expressed Ray-Data-first:

* one ``ray.data.Dataset`` per logical table, blocks are Arrow tables,
* every per-record transform is ``map_batches`` (``batch_format="pyarrow"``),
* stateful stages (alias automaton, predicate rules, embedding matrix) are
  actor pools — state built once per actor in ``__init__``,
* wide steps (entity canonicalization, exact triple dedup, sorted graph
  materialization) are groupby / sort shuffles with explicit skew salting,
* output is partitioned Parquet committed through a checkpoint manifest so a
  killed job resumes idempotently.

Nothing here imports from or executes code in the reference repo; the
reference is cited (file:line) in docstrings only to document which operator's
*semantics* each stage inherits (see SURVEY.md §2).
"""

__version__ = "0.1.0"
