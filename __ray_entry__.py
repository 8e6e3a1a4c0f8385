"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself BEFORE importing this module; nothing
here (or in the library) initializes or shuts down Ray.

- ``entry()``      — flagship KG pipeline (pages → tables → triples) on a
                     deterministic synthetic corpus sized for sf0.001.
- ``queries()``    — one entry per implemented operator/pipeline from
                     SURVEY.md §2 (see mannheimsearchjoinsengine_ray/
                     pipelines/queries.py); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL for EVERY query: relational ops
                     directly; the rest hash-oracled via persisted raw
                     intermediates (triple assembly, dedup sketches, IVF
                     probes, PPR as unrolled CTEs, the linking decision,
                     the greedy schema-match decision as a recursive CTE,
                     byte-exact text extraction against the corpus spec's
                     independent text column; see pipelines/queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mannheimsearchjoinsengine_ray.pipelines.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry() -> Any:
    """Flagship pipeline: synthetic page corpus at sf0.001 scale → triples."""
    return QUERIES["kg_triples"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
