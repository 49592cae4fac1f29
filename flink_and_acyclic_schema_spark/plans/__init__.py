"""Query plans — the engine's library of composable query constructors.

Where the reference hand-compiles one physical plan into five wired
ProcessFunctions (DataFlow.java:26-61), each plan here is a function
``(spark, sf_dir) -> DataFrame`` built from declarative DataFrame ops, so
Catalyst owns join strategy, exchange placement, and pushdown.
"""
