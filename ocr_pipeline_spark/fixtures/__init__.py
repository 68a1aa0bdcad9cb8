"""Deterministic synthetic `pages` fixtures (FIXTURES.md §1)."""
