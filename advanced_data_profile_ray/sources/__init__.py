"""Sources: parquet/csv readers with column pruning + the deterministic
transcript synthesizer."""
