"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module, so
nothing here (or in kgx) calls ``ray.init``/``ray.shutdown``.

* ``entry()``       — flagship KG pipeline on sf0.001, returns the final
                      triples Dataset.
* ``queries()``     — every implemented operator/pipeline (SURVEY.md §2 +
                      the training-data suite), keyed by name.
* ``oracle_sql()``  — DuckDB equivalents for the SQL-expressible subset;
                      the KG chain on enriched pages and the probabilistic
                      dedup/ANN variants are rows-only here and exactness-
                      gated in tests/ against the serial oracle instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from kgx import queries as Q


def entry() -> Any:
    """Flagship FULL-config pipeline (weighted linker, sentence packing) on
    /root/testdata/sf0.001; driver checks rows>=0."""
    return Q.kg_triples_full("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return Q.registry()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
