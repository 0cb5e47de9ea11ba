"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; neither
this module nor the library calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``      — flagship KG pipeline over sf0.001 synthetic webtext
- ``queries()``    — one callable per implemented operator (SURVEY §2)
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Webtext → extract → triples → link → canonicalize → HDT-style store;
    returns the canonical triples Dataset of the built graph."""
    from de_ray.hdt.store import Store
    from de_ray.pipelines.kg import run_kg_pipeline
    from de_ray.sources.webtext import webtext_dir_for

    wt = webtext_dir_for("/root/testdata/sf0.001")
    summary = run_kg_pipeline(wt, "/tmp/de_ray_entry/kg", resume=True)
    store = Store(summary["store_dir"])
    return store.triples_all()


def queries() -> dict[str, Callable[[str], Any]]:
    from de_ray.pipelines.driver_queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from de_ray.pipelines.driver_queries import oracle_sql as _oracle_sql

    return _oracle_sql()
