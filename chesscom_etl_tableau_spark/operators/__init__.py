"""Relational + LLM-pipeline operators built on DataFrame primitives."""
