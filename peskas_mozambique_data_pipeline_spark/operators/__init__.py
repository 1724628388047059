"""Relational operator library (SURVEY §2).

Every operator is a pure ``DataFrame -> DataFrame`` transform built from
declarative Spark SQL primitives so Catalyst can push filters, prune
columns, and choose join strategies.  Nothing here collects to the
driver in the hot path.
"""
