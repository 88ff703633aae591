"""Star-schema warehouse build (SURVEY.md §2.4 J4, S14)."""
