"""Distributed operators: crawl rounds, dedup, politeness, index, ranking,
similarity, text stats, multimodal plumbing."""
