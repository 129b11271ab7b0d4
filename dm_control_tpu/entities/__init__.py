"""Reusable composer entities (reference dm_control/entities)."""
