"""Mocap-driven walker pose initializers.

Behavioral contract: reference locomotion/walkers/initializers/
mocap.py CMUMocapInitializer — start the walker at a random frame of a
CMU clip (joints + velocities), on top of the upright root pose. Uses
the repo's SoA trajectory arrays instead of per-timestep protos.
"""

from __future__ import annotations

from dm_control_tpu.locomotion.mocap import cmu_mocap_data
from dm_control_tpu.locomotion.mocap import loader
from dm_control_tpu.locomotion.walkers import initializers


class CMUMocapInitializer(initializers.UprightInitializer):
  """Poses the walker at a random frame of one CMU mocap clip.

  Only suitable when the walker matches the mocap skeleton.
  """

  def __init__(self, mocap_key='CMU_077_02', version='2019',
               ref_path=None):
    if ref_path is None:
      ref_path = cmu_mocap_data.get_path_for_cmu(version)
    trajectory = loader.HDF5TrajectoryLoader(ref_path).get_trajectory(
        mocap_key)
    features = trajectory.as_dict()
    self._joints = features['walker/joints']
    self._joints_vel = features['walker/joints_velocity']
    self._root_vel = features['walker/velocity']
    self._root_angvel = features['walker/angular_velocity']

  def initialize_pose(self, physics, walker, random_state):
    super().initialize_pose(physics, walker, random_state)
    frame = random_state.randint(len(self._joints))
    binding = physics.bind(walker.mocap_joints)
    binding.qpos = self._joints[frame]
    binding.qvel = self._joints_vel[frame]
    walker.set_velocity(physics, velocity=self._root_vel[frame],
                        angular_velocity=self._root_angvel[frame])
