"""crawler_spark — a PySpark-native crawl-and-rank analytics engine.

A from-scratch rebuild of the capabilities of vertex-lab/crawler
(reference at /root/reference, read-only) re-expressed Spark-first:

- URL frontier + fetch scheduler (bloom URL-seen, per-host politeness,
  PageRank-mass priority) over partitioned parquet "Iceberg-style" tables.
- Link graph maintenance (dense id minting, delta partition, edge MERGE).
- Monte-Carlo PageRank via a maintained random-walk store: walk
  generation as iterative DataFrame joins + vectorized Arrow UDFs,
  incremental prune/graft walk repair, personalized PageRank stitching.
- Training-data pipeline operators: dedup (exact/minhash/simhash/
  jaccard/embedding), similarity search, text quality analysis,
  multimodal column plumbing.

All randomness is counter-based (see rng.py) so results are
partition-count-invariant and reproducible.
"""

__version__ = "0.1.0"
