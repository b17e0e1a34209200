"""Training-data pipeline operators over the generic test tables:
dedup, similarity search, text analysis, multimodal plumbing."""
