"""End-to-end pipelines (KG construction) and checkpoint/lineage helpers."""
