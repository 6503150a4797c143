"""Composed batch plans (the reference's combine/usage stages)."""
