"""A rodent walker.

Behavioral contract: reference locomotion/walkers/rodent.py `Rat` —
position-controlled rat with [-1, 1] control range; mocap joint order,
tracking-body filters, appendage observables, and pose->actuation
mapping. The model XML (assets/rodent.xml) is reference data,
all-primitive collision geoms (the .skn skin is visual-only). Body
accessors are generated from a name table.
"""

from __future__ import annotations

import os
import re

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.locomotion.walkers import base

_XML_PATH = os.path.join(os.path.dirname(__file__), 'assets/rodent.xml')

# task-spec mocap joint ordering (reference rodent.py:_RAT_MOCAP_JOINTS)
_RAT_MOCAP_JOINTS = [
    'vertebra_1_extend', 'vertebra_2_bend', 'vertebra_3_twist',
    'vertebra_4_extend', 'vertebra_5_bend', 'vertebra_6_twist',
    'hip_L_supinate', 'hip_L_abduct', 'hip_L_extend', 'knee_L',
    'ankle_L', 'toe_L', 'hip_R_supinate', 'hip_R_abduct',
    'hip_R_extend', 'knee_R', 'ankle_R', 'toe_R',
    'vertebra_C1_extend', 'vertebra_C1_bend', 'vertebra_C2_extend',
    'vertebra_C2_bend', 'vertebra_C3_extend', 'vertebra_C3_bend',
    'vertebra_C4_extend', 'vertebra_C4_bend', 'vertebra_C5_extend',
    'vertebra_C5_bend', 'vertebra_C6_extend', 'vertebra_C6_bend',
    'vertebra_C7_extend', 'vertebra_C9_bend', 'vertebra_C11_extend',
    'vertebra_C13_bend', 'vertebra_C15_extend', 'vertebra_C17_bend',
    'vertebra_C19_extend', 'vertebra_C21_bend', 'vertebra_C23_extend',
    'vertebra_C25_bend', 'vertebra_C27_extend', 'vertebra_C29_bend',
    'vertebra_cervical_5_extend', 'vertebra_cervical_4_bend',
    'vertebra_cervical_3_twist', 'vertebra_cervical_2_extend',
    'vertebra_cervical_1_bend', 'vertebra_axis_twist',
    'vertebra_atlant_extend', 'atlas', 'mandible',
    'scapula_L_supinate', 'scapula_L_abduct', 'scapula_L_extend',
    'shoulder_L', 'shoulder_sup_L', 'elbow_L', 'wrist_L', 'finger_L',
    'scapula_R_supinate', 'scapula_R_abduct', 'scapula_R_extend',
    'shoulder_R', 'shoulder_sup_R', 'elbow_R', 'wrist_R', 'finger_R',
]

_TORQUE_THRESHOLD = 60
_STAND_HEIGHT = 0.077

# accessor name -> model body name
_NAMED_BODIES = {
    'root_body': 'torso',
    'pelvis_body': 'pelvis',
    'head': 'skull',
    'left_arm_root': 'scapula_L',
    'right_arm_root': 'scapula_R',
}

_GROUND_CONTACT_BODIES = ('foot_L', 'foot_R', 'hand_L', 'hand_R',
                          'vertebra_C1')
_END_EFFECTOR_BODIES = ('lower_arm_R', 'lower_arm_L', 'foot_R',
                        'foot_L')
_NON_TRACKING_BODY_RE = re.compile(r'(vertebra|hand|toe)')


def _body_property(body_name):
  return property(
      lambda self: self._mjcf_root.find('body', body_name))


class Rat(base.Walker):
  """A position-controlled rat with control range scaled to [-1, 1]."""

  def _build(self, params=None, name='walker', torque_actuators=False,
             foot_mods=False, initializer=None):
    self.set_pose_initializers(initializer)
    self.params = params or {}
    self._mjcf_root = mjcf.from_path(
        self.params.get('_XML_PATH', _XML_PATH))
    if name:
      self._mjcf_root.model = name
    self.body_sites = []

    if torque_actuators:
      # direct torque drive: gain = max force, no position feedback
      for actuator in self._mjcf_root.find_all('actuator'):
        actuator.gainprm = [actuator.forcerange[1]]
        actuator.biastype = None
        actuator.biasprm = None

    if foot_mods:
      self._mjcf_root.find('default', 'ankle').joint.range = [-0.1, 2.]
      self._mjcf_root.find('default', 'toe').joint.range = [-0.7, 0.87]

  mjcf_model = property(lambda self: self._mjcf_root)

  @property
  def upright_pose(self):
    return base.WalkerPose(xpos=(0., 0., 0.), xquat=(1., 0., 0., 0.))

  @property
  def standing_height(self):
    return self.params.get('_STAND_HEIGHT', _STAND_HEIGHT)

  # ---------------------------------------------- model element views

  @property
  def actuators(self):
    return tuple(self._mjcf_root.find_all('actuator'))

  @property
  def ground_contact_geoms(self):
    geoms = []
    for body_name in _GROUND_CONTACT_BODIES:
      geoms.extend(self._mjcf_root.find('body',
                                        body_name).get_children('geom'))
    return tuple(geoms)

  @property
  def end_effectors(self):
    return tuple(self._mjcf_root.find('body', n)
                 for n in _END_EFFECTOR_BODIES)

  @property
  def observable_joints(self):
    return tuple(a.joint for a in self.actuators
                 if a.get_attributes().get('joint') is not None)

  @property
  def observable_tendons(self):
    return self._mjcf_root.find_all('tendon')

  @property
  def bodies(self):
    return tuple(self._mjcf_root.find_all('body'))

  @property
  def mocap_tracking_bodies(self):
    return tuple(b for b in self._mjcf_root.find_all('body')
                 if not _NON_TRACKING_BODY_RE.match(b.name))

  @property
  def egocentric_camera(self):
    return self._mjcf_root.find('camera', 'egocentric')

  # ---------------------------------------------- joint orderings

  @property
  def mocap_joints(self):
    return tuple(self._mjcf_root.find('joint', name)
                 for name in _RAT_MOCAP_JOINTS)

  @property
  def mocap_joint_order(self):
    return tuple(j.name for j in self.mocap_joints)

  def _joints_where(self, want_vertebra):
    return tuple(j for j in self._mjcf_root.find_all('joint')
                 if j.name and ('vertebra' in j.name) == want_vertebra)

  primary_joints = property(lambda self: self._joints_where(False))
  vertebra_joints = property(lambda self: self._joints_where(True))

  def _mocap_order_of(self, names):
    order = self.mocap_joint_order
    return [order.index(n) for n in names]

  @property
  def primary_joint_order(self):
    return self._mocap_order_of(j.name for j in self.primary_joints)

  @property
  def vertebra_joint_order(self):
    return self._mocap_order_of(j.name for j in self.vertebra_joints)

  @property
  def joint_actuator_order(self):
    return self._mocap_order_of(a.name for a in self.joint_actuators)

  # ---------------------------------------------- actuation

  @property
  def joint_actuators(self):
    return tuple(a for a in self.actuators
                 if a.get_attributes().get('joint') is not None)

  @property
  def joint_actuators_range(self):
    ranges = []
    for act in self.joint_actuators:
      joint = self._mjcf_root.find('joint', act.name)
      dclass = joint.get_attributes().get('class')
      span = (dclass.joint.range
              if dclass is not None and not isinstance(dclass, str)
              else joint.range)
      ranges.append(np.asarray(span, dtype=float))
    return ranges

  def pose_to_actuation(self, pose):
    """Actuation whose position targets equal `pose` (mocap order)."""
    spans = np.stack(self.joint_actuators_range)
    lo, hi = spans[:, 0], spans[:, 1]
    targets = np.asarray(pose)[self.joint_actuator_order]
    joint_actions = (2 * targets - (lo + hi)) / (hi - lo)
    n_tendon = len(self.actuators) - len(self.joint_actuators)
    return np.hstack([np.zeros(n_tendon), joint_actions])

  def _build_observables(self):
    return RodentObservables(self)


for _accessor, _body_name in _NAMED_BODIES.items():
  setattr(Rat, _accessor, _body_property(_body_name))
# post-class setattr satisfies the Walker ABC's abstract accessors
Rat.__abstractmethods__ = frozenset(
    n for n in Rat.__abstractmethods__ if n not in _NAMED_BODIES)


class RodentObservables(base.WalkerObservables):
  """Observables for the Rat."""

  @composer.observable
  def head_height(self):
    return observable.MJCFFeature('xpos', self._entity.head, index=2)

  @composer.observable
  def sensors_torque(self):
    sensors = [s for s in self._entity.mjcf_model.find_all('sensor')
               if s.tag == 'torque']
    return observable.MJCFFeature(
        'sensordata', sensors,
        corruptor=lambda v, random_state: np.tanh(
            2 * v / _TORQUE_THRESHOLD))

  @composer.observable
  def tendons_pos(self):
    return observable.MJCFFeature('length',
                                  self._entity.observable_tendons)

  @composer.observable
  def tendons_vel(self):
    return observable.MJCFFeature('velocity',
                                  self._entity.observable_tendons)

  @composer.observable
  def actuator_activation(self):
    return observable.MJCFFeature(
        'act', self._entity.mjcf_model.find_all('actuator'))

  @composer.observable
  def appendages_pos(self):
    """end_effectors_pos with the head appended, egocentric."""
    def appendages_in_torso_frame(physics):
      points = self._entity.end_effectors + (self._entity.head,)
      xpos = np.asarray(physics.bind(points).xpos)
      torso = physics.bind(self._entity.root_body)
      frame = np.reshape(np.asarray(torso.xmat), (3, 3))
      return np.reshape(
          (xpos - np.asarray(torso.xpos)).dot(frame), -1)
    return observable.Generic(appendages_in_torso_frame)

  @composer.observable
  def egocentric_camera(self):
    return observable.MJCFCamera(self._entity.egocentric_camera,
                                 width=64, height=64)

  @property
  def proprioception(self):
    return [self.joints_pos, self.joints_vel, self.tendons_pos,
            self.tendons_vel, self.actuator_activation,
            self.body_height, self.end_effectors_pos,
            self.appendages_pos, self.world_zaxis]
