"""Walker abstract base class.

Behavioural counterpart of reference
dm_control/locomotion/walkers/base.py:36-380 (+ legacy_base groups):
free-root creation, egocentric-frame transforms, actuator-derived action
specs, and the standard proprioceptive observable set.
"""

from __future__ import annotations

import abc
import collections

import numpy as np
from dm_env import specs

from dm_control_tpu import composer
from dm_control_tpu.composer.observation import observable


class WalkerPose(collections.namedtuple(
    'WalkerPose', ('qpos', 'xpos', 'xquat'))):
  """A walker's joint and Cartesian pose."""

  __slots__ = ()

  def __new__(cls, qpos=None, xpos=(0, 0, 0), xquat=(1, 0, 0, 0)):
    return super().__new__(
        cls,
        qpos=None if qpos is None else np.asarray(qpos, np.float64),
        xpos=np.asarray(xpos, np.float64),
        xquat=np.asarray(xquat, np.float64))


class Walker(composer.Entity, metaclass=abc.ABCMeta):
  """Abstract base class for walker robots."""

  def create_root_joints(self, attachment_frame) -> None:
    attachment_frame.add('freejoint')

  def _build_observables(self):
    return WalkerObservables(self)

  @property
  def upright_pose(self):
    return WalkerPose()

  def configure_joints(self, physics, qpos):
    """Writes a full joint configuration (reference legacy_base)."""
    physics.bind(self.mjcf_model.find_all('joint')).qpos = qpos

  def reinitialize_pose(self, physics, random_state):
    """Resets the walker via its initializers (reference
    legacy_base.py:49-51); defaults to the declared upright pose."""
    pose_initializers = getattr(self, '_pose_initializers', None)
    if pose_initializers:
      for initializer in pose_initializers:
        initializer.initialize_pose(physics, self, random_state)
      return
    pose = self.upright_pose
    if pose.qpos is not None:
      physics.bind(self.mocap_joints).qpos = pose.qpos
    self.set_pose(physics, position=pose.xpos, quaternion=pose.xquat)
    try:
      self.set_velocity(physics, velocity=np.zeros(3),
                        angular_velocity=np.zeros(3))
    except ValueError:
      pass  # fixed-base walker

  def set_pose_initializers(self, initializer):
    """Installs initializer(s) consulted by reinitialize_pose."""
    if initializer is None:
      self._pose_initializers = ()
    elif isinstance(initializer, (list, tuple)):
      self._pose_initializers = tuple(initializer)
    else:
      self._pose_initializers = (initializer,)

  def aliveness(self, physics):
    """[-1, 0] measure of walker viability; 0 = alive (legacy_base)."""
    del physics
    return 0.

  # ---------------- egocentric transforms ----------------
  def transform_vec_to_egocentric_frame(self, physics,
                                        vec_in_world_frame):
    return self.global_vector_to_local_frame(physics,
                                             vec_in_world_frame)

  def transform_xmat_to_egocentric_frame(self, physics, xmat):
    root_xmat = np.array(
        physics.bind(self.root_body).xmat).reshape(3, 3)
    return np.asarray(xmat).reshape(3, 3).T @ root_xmat

  # ---------------- body parts ----------------
  @property
  @abc.abstractmethod
  def root_body(self):
    """The walker's root body element."""

  @property
  def observable_joints(self):
    return [j for j in self.mjcf_model.find_all('joint')
            if j.tag == 'joint' and (j.type or 'hinge') != 'free']

  @property
  def actuators(self):
    return self.mjcf_model.find_all('actuator')

  @property
  def end_effectors(self):
    return ()

  # ---------------- mocap tracking support ----------------
  @property
  def mocap_joints(self):
    """Joints in the canonical mocap-clip order (default: doc order)."""
    return tuple(j for j in self.mjcf_model.find_all('joint')
                 if j.tag == 'joint' and (j.type or 'hinge') != 'free')

  @property
  def mocap_tracking_bodies(self):
    """Bodies whose world pose is matched against mocap clips."""
    return tuple(self.mjcf_model.find_all('body'))

  def actuator_force(self, physics):
    return physics.bind(self.observable_joints).qfrc_actuator

  @property
  def mocap_to_observable_joint_order(self):
    mocap = list(self.mocap_joints)
    return [mocap.index(j) for j in self.observable_joints]

  @property
  def observable_to_mocap_joint_order(self):
    obs = list(self.observable_joints)
    return [obs.index(j) for j in self.mocap_joints]

  @property
  def egocentric_camera(self):
    return None

  @property
  def ground_contact_geoms(self):
    return ()

  # ---------------- action interface ----------------
  def apply_action(self, physics, action, random_state):
    del random_state
    physics.bind(self.actuators).ctrl = np.asarray(action)

  def action_spec(self, physics):
    binding = physics.bind(self.actuators)
    minima = np.asarray(binding.ctrlrange)[:, 0]
    maxima = np.asarray(binding.ctrlrange)[:, 1]
    return specs.BoundedArray(
        shape=(len(self.actuators),), dtype=np.float64,
        minimum=minima, maximum=maxima)


class WalkerObservables(composer.Observables):
  """Standard proprioceptive observables (legacy_base.py:31-380)."""

  @composer.observable
  def joints_pos(self):
    return observable.MJCFFeature('qpos',
                                  self._entity.observable_joints)

  @composer.observable
  def joints_vel(self):
    return observable.MJCFFeature('qvel',
                                  self._entity.observable_joints)

  @composer.observable
  def world_zaxis(self):
    """The world's z-vector in this walker's torso frame."""
    def get_zaxis(physics):
      return np.array(
          physics.bind(self._entity.root_body).xmat).reshape(3, 3)[2]
    return observable.Generic(get_zaxis)

  @composer.observable
  def body_height(self):
    return observable.MJCFFeature('xpos', self._entity.root_body,
                                  index=2)

  @composer.observable
  def end_effectors_pos(self):
    """End-effector positions in the egocentric frame
    (reference legacy_base.py end_effectors_pos)."""
    def relative_pos_in_egocentric_frame(physics):
      end_effector = np.asarray(
          physics.bind(self._entity.end_effectors).xpos)
      torso = np.asarray(physics.bind(self._entity.root_body).xpos)
      xmat = np.reshape(
          np.asarray(physics.bind(self._entity.root_body).xmat), (3, 3))
      return np.reshape(np.dot(end_effector - torso, xmat), -1)
    return observable.Generic(relative_pos_in_egocentric_frame)

  @composer.observable
  def position(self):
    return observable.MJCFFeature('xpos', self._entity.root_body)

  @composer.observable
  def orientation(self):
    return observable.MJCFFeature('xmat', self._entity.root_body)

  @property
  def proprioception(self):
    return [self.joints_pos, self.joints_vel]

  @property
  def kinematic_sensors(self):
    return []

  @property
  def dynamic_sensors(self):
    return []

  def enable_proprioception(self):
    for obs in self.proprioception:
      obs.enabled = True
    self.world_zaxis.enabled = True
