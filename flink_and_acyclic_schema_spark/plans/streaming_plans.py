"""Structured Streaming plans (incremental Q10, watermarked windows).

Filled in progressively; see streaming/ package.
"""
