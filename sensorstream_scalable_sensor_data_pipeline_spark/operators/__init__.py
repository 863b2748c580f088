"""Relational/dataflow operators (SURVEY.md §2 inventory, re-expressed
Spark-first)."""
