"""Operators: the extraction kernel plus relational/window/dedup/similarity/
text-analysis/multimodal operator builders."""
