"""Relational / join / window / LLM-data operators (SURVEY.md §2)."""
