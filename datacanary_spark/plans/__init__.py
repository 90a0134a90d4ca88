"""Plans: filter-pipeline assembly, lineage/metrics, checkpointed jobs."""
