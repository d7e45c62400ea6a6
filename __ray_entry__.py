"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in filda_ray library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (geocode -> hex/S2 encode -> background
    median/MAD -> contextual anomaly -> PIP join -> per-cell counts ->
    QA bits) on /root/testdata/sf0.001."""
    from filda_ray.pipelines.flagship import detect_pipeline

    return detect_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from filda_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from filda_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
