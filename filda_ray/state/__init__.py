"""Checkpoint manifests, lineage, and per-stage metrics."""
