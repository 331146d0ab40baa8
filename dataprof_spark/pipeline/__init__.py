"""End-to-end pipeline: fixture corpus, single-node reference labeler,
Spark run with per-partition checkpoint/lineage."""
