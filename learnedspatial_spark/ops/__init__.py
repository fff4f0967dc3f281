"""Operational layer: resumable checkpoints, per-partition lineage+metrics."""
