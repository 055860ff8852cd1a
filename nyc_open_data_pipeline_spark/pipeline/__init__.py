"""ETL pipeline spine: config -> fetch -> transform -> validate -> store.

Mirrors the reference lifecycle (SURVEY.md §3.1) with lazy Spark plans:
connectors produce DataFrames, transformer plugins compose Catalyst nodes,
validation triggers small counting jobs, and the storage write is the one
main action.
"""
