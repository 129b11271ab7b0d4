"""A rodent walker (reference locomotion/walkers/rodent.py:60-334).

Position-controlled rat with [-1, 1] control range; the model XML
(assets/rodent.xml) is reference data, all-primitive collision geoms
(the .skn skin is visual-only).
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

_UPRIGHT_POS = (0.0, 0.0, 0.0)
_UPRIGHT_QUAT = (1., 0., 0., 0.)
_TORQUE_THRESHOLD = 60
_STAND_HEIGHT = 0.077


class Rat(base.Walker):
  """A position-controlled rat with control range scaled to [-1, 1]."""

  def _build(self, params=None, name='walker', torque_actuators=False,
             foot_mods=False, initializer=None):
    del initializer
    self.params = params or {}
    self._mjcf_root = mjcf.from_path(
        self.params.get('_XML_PATH', _XML_PATH))
    if name:
      self._mjcf_root.model = name
    self.body_sites = []

    if torque_actuators:
      for actuator in self._mjcf_root.find_all('actuator'):
        actuator.gainprm = [actuator.forcerange[1]]
        actuator.biastype = None
        actuator.biasprm = None

    if foot_mods:
      self._mjcf_root.find('default', 'ankle').joint.range = [-0.1, 2.]
      self._mjcf_root.find('default', 'toe').joint.range = [-0.7, 0.87]

  @property
  def upright_pose(self):
    return base.WalkerPose(xpos=_UPRIGHT_POS, xquat=_UPRIGHT_QUAT)

  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def actuators(self):
    return tuple(self._mjcf_root.find_all('actuator'))

  @property
  def root_body(self):
    return self._mjcf_root.find('body', 'torso')

  @property
  def pelvis_body(self):
    return self._mjcf_root.find('body', 'pelvis')

  @property
  def head(self):
    return self._mjcf_root.find('body', 'skull')

  @property
  def left_arm_root(self):
    return self._mjcf_root.find('body', 'scapula_L')

  @property
  def right_arm_root(self):
    return self._mjcf_root.find('body', 'scapula_R')

  @property
  def ground_contact_geoms(self):
    out = []
    for bname in ('foot_L', 'foot_R', 'hand_L', 'hand_R',
                  'vertebra_C1'):
      body = self._mjcf_root.find('body', bname)
      out.extend(body.get_children('geom'))
    return tuple(out)

  @property
  def standing_height(self):
    return self.params.get('_STAND_HEIGHT', _STAND_HEIGHT)

  @property
  def end_effectors(self):
    return (self._mjcf_root.find('body', 'lower_arm_R'),
            self._mjcf_root.find('body', 'lower_arm_L'),
            self._mjcf_root.find('body', 'foot_R'),
            self._mjcf_root.find('body', 'foot_L'))

  @property
  def observable_joints(self):
    return tuple(a.joint for a in self.actuators
                 if a.get_attributes().get('joint') is not None)

  @property
  def observable_tendons(self):
    return self._mjcf_root.find_all('tendon')

  @property
  def mocap_joints(self):
    return tuple(self._mjcf_root.find('joint', name)
                 for name in _RAT_MOCAP_JOINTS)

  @property
  def mocap_joint_order(self):
    return tuple(jnt.name for jnt in self.mocap_joints)

  @property
  def bodies(self):
    return tuple(self._mjcf_root.find_all('body'))

  @property
  def mocap_tracking_bodies(self):
    return tuple(body for body in self._mjcf_root.find_all('body')
                 if not re.match(r'(vertebra|hand|toe)', body.name))

  @property
  def primary_joints(self):
    return tuple(jnt for jnt in self._mjcf_root.find_all('joint')
                 if jnt.name and 'vertebra' not in jnt.name)

  @property
  def vertebra_joints(self):
    return tuple(jnt for jnt in self._mjcf_root.find_all('joint')
                 if jnt.name and 'vertebra' in jnt.name)

  @property
  def primary_joint_order(self):
    joint_names = self.mocap_joint_order
    return [joint_names.index(jnt.name) for jnt in self.primary_joints]

  @property
  def vertebra_joint_order(self):
    joint_names = self.mocap_joint_order
    return [joint_names.index(jnt.name)
            for jnt in self.vertebra_joints]

  @property
  def egocentric_camera(self):
    return self._mjcf_root.find('camera', 'egocentric')

  @property
  def joint_actuators(self):
    return tuple(a for a in self._mjcf_root.find_all('actuator')
                 if a.get_attributes().get('joint') is not None)

  @property
  def joint_actuators_range(self):
    out = []
    for act in self.joint_actuators:
      associated_joint = self._mjcf_root.find('joint', act.name)
      dclass = associated_joint.get_attributes().get('class')
      if dclass is not None and not isinstance(dclass, str):
        act_range = dclass.joint.range
      else:
        act_range = associated_joint.range
      out.append(np.asarray(act_range, dtype=float))
    return out

  def pose_to_actuation(self, pose):
    """Actuation whose position targets equal `pose` (mocap order)."""
    r_lower = np.array([r[0] for r in self.joint_actuators_range])
    r_upper = np.array([r[1] for r in self.joint_actuators_range])
    num_tendon_actuators = len(self.actuators) - len(
        self.joint_actuators)
    tendon_actions = np.zeros(num_tendon_actuators)
    return np.hstack([
        tendon_actions,
        (2 * np.asarray(pose)[self.joint_actuator_order] -
         (r_lower + r_upper)) / (r_upper - r_lower)])

  @property
  def joint_actuator_order(self):
    joint_names = self.mocap_joint_order
    return [joint_names.index(act.name)
            for act in self.joint_actuators]

  def _build_observables(self):
    return RodentObservables(self)


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
    def relative_pos_in_egocentric_frame(physics):
      end_effectors_with_head = (
          self._entity.end_effectors + (self._entity.head,))
      end_effector = np.asarray(
          physics.bind(end_effectors_with_head).xpos)
      torso = np.asarray(physics.bind(self._entity.root_body).xpos)
      xmat = np.reshape(np.asarray(
          physics.bind(self._entity.root_body).xmat), (3, 3))
      return np.reshape(np.dot(end_effector - torso, xmat), -1)
    return observable.Generic(relative_pos_in_egocentric_frame)

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
