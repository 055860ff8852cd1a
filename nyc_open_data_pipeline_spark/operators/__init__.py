"""Relational operator library: reusable DataFrame -> DataFrame building blocks."""
