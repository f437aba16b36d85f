"""Operator library — SURVEY.md section 2 inventory, Spark-first."""
