"""Relational + training-data operators built on the DataFrame API."""
