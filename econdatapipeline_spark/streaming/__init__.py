"""Structured Streaming surface over event streams."""
