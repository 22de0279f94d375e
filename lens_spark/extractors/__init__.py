"""Leaf extractors called from Arrow-batched UDFs.

Each module is pure Python over bytes/strings (no Spark imports) so it is
unit-testable standalone and callable from the single-threaded oracle
(tests/oracle.py) as well as from ``mapInPandas`` batches.
"""
