"""Scalar / vector / text function layer (SURVEY.md §2.7)."""
