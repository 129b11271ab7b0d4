"""Prop entities (reference dm_control/entities/props)."""

from dm_control_tpu.entities.props.duplo import Duplo
from dm_control_tpu.entities.props.position_detector import PositionDetector
from dm_control_tpu.entities.props.primitive import Primitive

__all__ = ['Duplo', 'Primitive', 'PositionDetector']
