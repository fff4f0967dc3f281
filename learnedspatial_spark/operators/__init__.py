"""Engine operators: partitioning, learned models, spatial queries,
dedup/similarity/text pipelines."""
