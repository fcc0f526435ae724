"""Dataset-level operators: deduplication families, similarity search,
and multimodal column plumbing for training-data pipelines at scale."""
