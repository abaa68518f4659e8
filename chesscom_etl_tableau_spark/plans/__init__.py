"""Composed query plans: batch ingest and the 9 dashboard visual queries."""
