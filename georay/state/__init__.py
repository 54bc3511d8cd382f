"""Checkpointing, lineage and resume (north_rule resumability)."""
