"""Operator library: extraction, layout, relational, dedup, similarity,
text stats, alignment, multimodal."""
