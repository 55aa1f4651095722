"""Training-data pipeline operators: dedup, similarity, text stats, multimodal."""
