"""Operators: extraction kernels, linking, canonicalization, dedup, ANN."""
