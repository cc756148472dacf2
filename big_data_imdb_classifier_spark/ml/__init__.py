"""MLlib surface (SURVEY.md §2.9, M1-M7 + S8)."""
