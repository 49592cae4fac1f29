"""Sources: typed parquet scans (tables.py) and the reference-format
multiplexed changelog text source (changelog_source.py)."""
