"""Vectorized column functions: extraction, text analysis, dedup,
similarity, multimodal plumbing."""
