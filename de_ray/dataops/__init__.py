"""Large-scale training-data operators: dedup, text analysis, similarity, multimodal."""
