"""Extension-operator query surface (populated next: dedup, similarity search,
text analysis, multimodal)."""
