"""Custom operator library.

The only places this engine adds code beyond declarative DataFrame plans:
the signed-weight changelog algebra (SURVEY.md §4.3), dedup/similarity/text
operators for LLM data pipelines, and streaming state recipes. Everything else
is Catalyst built-ins on purpose.
"""
