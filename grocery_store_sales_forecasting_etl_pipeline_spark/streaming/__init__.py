"""Structured Streaming facade (SURVEY.md §2.12/§7 step 6 extension —
the reference is batch-only; this is the engine's streaming door)."""
