"""RL environment contract (dm_env adapter)."""
