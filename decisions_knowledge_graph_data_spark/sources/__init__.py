"""Sources: deterministic synthetic corpus/registry generators + readers."""
