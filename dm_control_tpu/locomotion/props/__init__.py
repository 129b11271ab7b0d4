"""Locomotion props (reference dm_control/locomotion/props)."""

from dm_control_tpu.locomotion.props.target_sphere import TargetSphere

__all__ = ['TargetSphere']
