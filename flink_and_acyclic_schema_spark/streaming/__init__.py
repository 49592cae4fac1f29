"""Structured Streaming recipes: incremental view maintenance (incremental.py)
and watermarked window aggregations (windows live in plans/streaming_plans.py).
"""
