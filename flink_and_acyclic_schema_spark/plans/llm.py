"""LLM training-data pipeline operators over documents/embeddings.

Filled in progressively; see operators/dedup.py, operators/similarity.py,
operators/text.py.
"""
