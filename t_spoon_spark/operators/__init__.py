"""Reusable operator implementations that Spark lacks as built-ins,
composed from DataFrame primitives (no row-at-a-time Python in the
hot path). Each is designed for the shuffle behavior you'd want at
100 TB: as-of join is one shuffle + window (no range explosion),
sessionization is one shuffle + lag/cumsum.
"""
