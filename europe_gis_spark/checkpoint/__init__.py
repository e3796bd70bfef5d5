"""Checkpoint / lineage layer (S12, S13, G11 + resume)."""
