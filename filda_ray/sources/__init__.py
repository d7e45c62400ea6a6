"""Deterministic synthetic sources (no external data).

The engine's primary input is a Parquet table of Common-Crawl-style
pages ``(url, warc_ts, html, text, lang)`` per BASELINE.json
input_hint.  The sandbox testdata provides a ``documents`` table; the
``pages`` source derives the page table from it with *pure integer /
IEEE-double arithmetic that is mirrored 1:1 in SQL*, so every derived
column (host, lat/lon, tiles, background stats) is checkable against a
DuckDB oracle on the same parquet files.
"""
