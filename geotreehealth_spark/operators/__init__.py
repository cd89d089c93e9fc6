"""DataFrame-level operators reproducing the reference's semantics (SURVEY.md §2)."""
