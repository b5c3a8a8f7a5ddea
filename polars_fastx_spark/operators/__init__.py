"""Composed operators (SURVEY.md §2.3 J7/J8, §2.11 L1-L5)."""
