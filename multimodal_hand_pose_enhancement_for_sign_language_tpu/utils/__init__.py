"""Cross-cutting utilities: constants/registries, PRNG helpers, metrics."""
