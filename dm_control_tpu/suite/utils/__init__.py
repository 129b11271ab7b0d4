"""Suite-level utilities (reference dm_control/suite/utils/)."""
