"""Motion-capture trajectory loading and playback."""

from dm_control_tpu.locomotion.mocap.loader import DictTrajectoryLoader
from dm_control_tpu.locomotion.mocap.loader import HDF5TrajectoryLoader
from dm_control_tpu.locomotion.mocap.loader import TrajectoryLoader
from dm_control_tpu.locomotion.mocap.props import Prop
from dm_control_tpu.locomotion.mocap.trajectory import ClipData
from dm_control_tpu.locomotion.mocap.trajectory import Trajectory
from dm_control_tpu.locomotion.mocap.walkers import WalkerInfo
