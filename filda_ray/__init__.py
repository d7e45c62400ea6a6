"""filda_ray — a Ray-Data-native spatial tiling + join engine.

A from-scratch engine (NOT a port) re-expressing the capabilities of the
GEOS-ESM/FILDA reference (per-pixel fire-light detection over VIIRS
granules) over Common-Crawl-style web-page tables:

- geocoding (url -> lat/lon via a broadcast gazetteer),
- hierarchical cell encoding (hex grid + S2 quadtree, pure numpy),
- contextual background characterization (median/MAD over spatial
  neighborhoods via groupby shuffles; FILDA.py:767-872 analog),
- per-row anomaly classification (FILDA.py:875-998 analog),
- point-in-polygon joins (STRtree + ray casting actor pools;
  FILDA.py:1570-1699 analog),
- per-tile clustering/aggregation, dedup, stateful model scoring,
- partitioned, resumable Parquet products with lineage + metrics.

Everything runs as ``ray.data.Dataset`` pipelines of ``map_batches``
over zero-copy Arrow batches; stateful stages are actor pools.

This package never calls ``ray.init()``; sessions are owned by the
caller (tests / bench.py / CLI).
"""

__version__ = "0.1.0"
