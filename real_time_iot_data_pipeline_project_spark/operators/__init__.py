"""DataFrame → DataFrame transforms implementing SURVEY.md §2."""
