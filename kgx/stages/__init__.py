"""Ray Data stage callables for the KG pipeline.

Stateless transforms are plain functions (cheap, elastic tasks); stateful
stages are callable CLASSES run as actor pools via
``map_batches(Cls, concurrency=N, batch_size=B)`` with all model/automaton
construction in ``__init__`` (SURVEY.md §2.3).  All stages are Arrow in /
Arrow out (``batch_format="pyarrow"``).
"""
