"""Shared infrastructure for manipulation tasks
(reference manipulation/shared)."""
