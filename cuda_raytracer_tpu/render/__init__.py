"""Render orchestrators (reference layer L4)."""
