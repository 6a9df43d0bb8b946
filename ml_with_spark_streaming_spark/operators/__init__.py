"""Extended operator surface: text analysis, dedup, similarity search,
multimodal columns — the LLM-training-data-pipeline layer."""
