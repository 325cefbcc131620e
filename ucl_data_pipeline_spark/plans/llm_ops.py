"""LLM-data ops (filled in below)."""
