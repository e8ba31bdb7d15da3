"""Training-data pipeline operators (dedup, similarity, text stats,
multimodal plumbing) — the large-scale corpus-processing layer that a
crawl feeds. All hot paths are JVM-side column expressions; the only
Python is Arrow-batched (multimodal decode plumbing)."""
