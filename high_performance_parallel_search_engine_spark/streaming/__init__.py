"""Structured Streaming formulation of the crawl pipeline."""
