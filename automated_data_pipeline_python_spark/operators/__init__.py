"""Composite operators Spark lacks as built-ins.

Each is a composition of DataFrame ops where semantics allow, dropping to
Arrow-batched ``applyInPandas`` only where genuinely needed (as-of join).
"""
