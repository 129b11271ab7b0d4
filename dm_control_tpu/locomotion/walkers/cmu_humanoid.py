"""CMU humanoid walkers (reference locomotion/walkers/cmu_humanoid.py).

The 56-dof humanoid converted from the CMU mocap skeleton, plus the
position-controlled variants whose [-1, 1] controls map onto joint
ranges through affine-scaled actuators (scaled_actuators.py). The
V2019/V2020 model XMLs are reference data (assets/, attributed).
"""

from __future__ import annotations

import abc
import collections
import os

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.locomotion.walkers import base
from dm_control_tpu.locomotion.walkers import rescale
from dm_control_tpu.locomotion.walkers import scaled_actuators

_XML_PATH = os.path.join(os.path.dirname(__file__),
                         'assets/humanoid_CMU_V{model_version}.xml')

_WALKER_GEOM_GROUP = 2
_WALKER_INVIS_GROUP = 1

_CMU_MOCAP_JOINTS = (
    'lfemurrz', 'lfemurry', 'lfemurrx', 'ltibiarx', 'lfootrz', 'lfootrx',
    'ltoesrx', 'rfemurrz', 'rfemurry', 'rfemurrx', 'rtibiarx', 'rfootrz',
    'rfootrx', 'rtoesrx', 'lowerbackrz', 'lowerbackry', 'lowerbackrx',
    'upperbackrz', 'upperbackry', 'upperbackrx', 'thoraxrz', 'thoraxry',
    'thoraxrx', 'lowerneckrz', 'lowerneckry', 'lowerneckrx',
    'upperneckrz', 'upperneckry', 'upperneckrx', 'headrz', 'headry',
    'headrx', 'lclaviclerz', 'lclaviclery', 'lhumerusrz', 'lhumerusry',
    'lhumerusrx', 'lradiusrx', 'lwristry', 'lhandrz', 'lhandrx',
    'lfingersrx', 'lthumbrz', 'lthumbrx', 'rclaviclerz', 'rclaviclery',
    'rhumerusrz', 'rhumerusry', 'rhumerusrx', 'rradiusrx', 'rwristry',
    'rhandrz', 'rhandrx', 'rfingersrx', 'rthumbrz', 'rthumbrx')

PositionActuatorParams = collections.namedtuple(
    'PositionActuatorParams', ['name', 'forcerange', 'kp'])

# per-joint gains/force limits of the reference position-controlled
# variant (cmu_humanoid.py:53-114)
_POSITION_ACTUATORS = [PositionActuatorParams(*p) for p in [
    ('headrx', [-20, 20], 20), ('headry', [-20, 20], 20),
    ('headrz', [-20, 20], 20), ('lclaviclery', [-20, 20], 20),
    ('lclaviclerz', [-20, 20], 20), ('lfemurrx', [-120, 120], 120),
    ('lfemurry', [-80, 80], 80), ('lfemurrz', [-80, 80], 80),
    ('lfingersrx', [-20, 20], 20), ('lfootrx', [-50, 50], 50),
    ('lfootrz', [-50, 50], 50), ('lhandrx', [-20, 20], 20),
    ('lhandrz', [-20, 20], 20), ('lhumerusrx', [-60, 60], 60),
    ('lhumerusry', [-60, 60], 60), ('lhumerusrz', [-60, 60], 60),
    ('lowerbackrx', [-120, 120], 150), ('lowerbackry', [-120, 120], 150),
    ('lowerbackrz', [-120, 120], 150), ('lowerneckrx', [-20, 20], 20),
    ('lowerneckry', [-20, 20], 20), ('lowerneckrz', [-20, 20], 20),
    ('lradiusrx', [-60, 60], 60), ('lthumbrx', [-20, 20], 20),
    ('lthumbrz', [-20, 20], 20), ('ltibiarx', [-80, 80], 80),
    ('ltoesrx', [-20, 20], 20), ('lwristry', [-20, 20], 20),
    ('rclaviclery', [-20, 20], 20), ('rclaviclerz', [-20, 20], 20),
    ('rfemurrx', [-120, 120], 120), ('rfemurry', [-80, 80], 80),
    ('rfemurrz', [-80, 80], 80), ('rfingersrx', [-20, 20], 20),
    ('rfootrx', [-50, 50], 50), ('rfootrz', [-50, 50], 50),
    ('rhandrx', [-20, 20], 20), ('rhandrz', [-20, 20], 20),
    ('rhumerusrx', [-60, 60], 60), ('rhumerusry', [-60, 60], 60),
    ('rhumerusrz', [-60, 60], 60), ('rradiusrx', [-60, 60], 60),
    ('rthumbrx', [-20, 20], 20), ('rthumbrz', [-20, 20], 20),
    ('rtibiarx', [-80, 80], 80), ('rtoesrx', [-20, 20], 20),
    ('rwristry', [-20, 20], 20), ('thoraxrx', [-80, 80], 100),
    ('thoraxry', [-80, 80], 100), ('thoraxrz', [-80, 80], 100),
    ('upperbackrx', [-80, 80], 80), ('upperbackry', [-80, 80], 80),
    ('upperbackrz', [-80, 80], 80), ('upperneckrx', [-20, 20], 20),
    ('upperneckry', [-20, 20], 20), ('upperneckrz', [-20, 20], 20),
]]

PositionActuatorParamsV2020 = collections.namedtuple(
    'PositionActuatorParamsV2020',
    ['name', 'forcerange', 'kp', 'damping'])

_POSITION_ACTUATORS_V2020 = [PositionActuatorParamsV2020(*p) for p in [
    ('headrx', [-40, 40], 40, 2), ('headry', [-40, 40], 40, 2),
    ('headrz', [-40, 40], 40, 2), ('lclaviclery', [-80, 80], 80, 20),
    ('lclaviclerz', [-80, 80], 80, 20),
    ('lfemurrx', [-300, 300], 300, 15),
    ('lfemurry', [-200, 200], 200, 10),
    ('lfemurrz', [-200, 200], 200, 10),
    ('lfingersrx', [-20, 20], 20, 1), ('lfootrx', [-120, 120], 120, 6),
    ('lfootrz', [-50, 50], 50, 3), ('lhandrx', [-20, 20], 20, 1),
    ('lhandrz', [-20, 20], 20, 1), ('lhumerusrx', [-120, 120], 120, 6),
    ('lhumerusry', [-120, 120], 120, 6),
    ('lhumerusrz', [-120, 120], 120, 6),
    ('lowerbackrx', [-300, 300], 300, 15),
    ('lowerbackry', [-180, 180], 180, 20),
    ('lowerbackrz', [-200, 200], 200, 20),
    ('lowerneckrx', [-120, 120], 120, 20),
    ('lowerneckry', [-120, 120], 120, 20),
    ('lowerneckrz', [-120, 120], 120, 20),
    ('lradiusrx', [-90, 90], 90, 5), ('lthumbrx', [-20, 20], 20, 1),
    ('lthumbrz', [-20, 20], 20, 1), ('ltibiarx', [-160, 160], 160, 8),
    ('ltoesrx', [-20, 20], 20, 1), ('lwristry', [-20, 20], 20, 1),
    ('rclaviclery', [-80, 80], 80, 20),
    ('rclaviclerz', [-80, 80], 80, 20),
    ('rfemurrx', [-300, 300], 300, 15),
    ('rfemurry', [-200, 200], 200, 10),
    ('rfemurrz', [-200, 200], 200, 10),
    ('rfingersrx', [-20, 20], 20, 1), ('rfootrx', [-120, 120], 120, 6),
    ('rfootrz', [-50, 50], 50, 3), ('rhandrx', [-20, 20], 20, 1),
    ('rhandrz', [-20, 20], 20, 1), ('rhumerusrx', [-120, 120], 120, 6),
    ('rhumerusry', [-120, 120], 120, 6),
    ('rhumerusrz', [-120, 120], 120, 6),
    ('rradiusrx', [-90, 90], 90, 5), ('rthumbrx', [-20, 20], 20, 1),
    ('rthumbrz', [-20, 20], 20, 1), ('rtibiarx', [-160, 160], 160, 8),
    ('rtoesrx', [-20, 20], 20, 1), ('rwristry', [-20, 20], 20, 1),
    ('thoraxrx', [-300, 300], 300, 15), ('thoraxry', [-80, 80], 80, 8),
    ('thoraxrz', [-200, 200], 200, 12),
    ('upperbackrx', [-300, 300], 300, 15),
    ('upperbackry', [-80, 80], 80, 8),
    ('upperbackrz', [-200, 200], 200, 12),
    ('upperneckrx', [-60, 60], 60, 10),
    ('upperneckry', [-60, 60], 60, 10),
    ('upperneckrz', [-60, 60], 60, 10),
]]

_UPRIGHT_POS = (0.0, 0.0, 0.94)
_UPRIGHT_POS_V2020 = (0.0, 0.0, 1.143)
_UPRIGHT_QUAT = (0.859, 1.0, 1.0, 0.859)

_STAND_HEIGHT = 1.5
_TORQUE_THRESHOLD = 60


class _CMUHumanoidBase(base.Walker, metaclass=abc.ABCMeta):
  """The abstract base for walkers compatible with the CMU humanoid."""

  def _build(self, name='walker', marker_rgba=None, include_face=False,
             initializer=None):
    self.set_pose_initializers(initializer)
    self._mjcf_root = mjcf.from_path(self._xml_path)
    if name:
      self._mjcf_root.model = name

    if marker_rgba is not None:
      for geom in self.marker_geoms:
        geom.rgba = marker_rgba

    self._actuator_order = np.argsort(_CMU_MOCAP_JOINTS)
    self._inverse_order = np.argsort(self._actuator_order)

    if include_face:
      head = self._mjcf_root.find('body', 'head')
      head.add('geom', type='capsule', name='face',
               size=[0.065, 0.014], pos=[0.000341465, 0.048184, 0.01],
               quat=[0.717887, 0.696142, -0.00493334, 0], mass=0.,
               contype=0, conaffinity=0)
      face_forwardness = np.asarray(head.pos)[1] - .02
      head_geom = self._mjcf_root.find('geom', 'head')
      nose_size = np.asarray(head_geom.size)[0] / 4.75
      face = head.add('body', name='face',
                      pos=[0.0, 0.039, face_forwardness])
      face.add('geom', type='capsule', name='nose',
               size=[nose_size, 0.01], pos=[0.0, 0.0, 0.0],
               quat=[1, 0.7, 0, 0], mass=0., contype=0, conaffinity=0,
               group=_WALKER_INVIS_GROUP)

  def _build_observables(self):
    return CMUHumanoidObservables(self)

  @property
  @abc.abstractmethod
  def _xml_path(self):
    raise NotImplementedError

  @property
  def mocap_joints(self):
    return tuple(self._mjcf_root.find('joint', name)
                 for name in _CMU_MOCAP_JOINTS)

  @property
  def actuator_order(self):
    """Actuator index -> canonical CMU joint index."""
    return self._actuator_order

  @property
  def actuator_to_joint_order(self):
    """Canonical CMU joint index -> actuator index."""
    return self._inverse_order

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
    return self._mjcf_root.find('body', 'root')

  @property
  def head(self):
    return self._mjcf_root.find('body', 'head')

  @property
  def left_arm_root(self):
    return self._mjcf_root.find('body', 'lclavicle')

  @property
  def right_arm_root(self):
    return self._mjcf_root.find('body', 'rclavicle')

  @property
  def ground_contact_geoms(self):
    lfoot = self._mjcf_root.find('body', 'lfoot')
    rfoot = self._mjcf_root.find('body', 'rfoot')
    return tuple(lfoot.get_children('geom') +
                 rfoot.get_children('geom'))

  @property
  def standing_height(self):
    return _STAND_HEIGHT

  @property
  def end_effectors(self):
    return (self._mjcf_root.find('body', 'rradius'),
            self._mjcf_root.find('body', 'lradius'),
            self._mjcf_root.find('body', 'rfoot'),
            self._mjcf_root.find('body', 'lfoot'))

  @property
  def observable_joints(self):
    return tuple(a.joint for a in self.actuators
                 if a.get_attributes().get('joint') is not None)

  @property
  def bodies(self):
    return tuple(self._mjcf_root.find_all('body'))

  @property
  def mocap_tracking_bodies(self):
    """Bodies for mocap tracking (every body except the root)."""
    root_body = self._mjcf_root.find('body', 'root')
    return tuple(b for b in self._mjcf_root.find_all('body')
                 if b is not root_body)

  @property
  def egocentric_camera(self):
    return self._mjcf_root.find('camera', 'egocentric')

  @property
  def body_camera(self):
    return self._mjcf_root.find('camera', 'bodycam')

  @property
  def marker_geoms(self):
    return (self._mjcf_root.find('geom', 'rradius'),
            self._mjcf_root.find('geom', 'lradius'))


class CMUHumanoid(_CMUHumanoidBase):
  """A CMU humanoid walker."""

  @property
  def _xml_path(self):
    return _XML_PATH.format(model_version='2019')


class CMUHumanoidPositionControlled(CMUHumanoid):
  """Position-controlled CMU humanoid, controls scaled to [-1, 1]."""

  def _build(self, model_version='2019', **kwargs):
    self._version = model_version
    scale_default = kwargs.pop('scale_default', False)
    super()._build(**kwargs)

    if scale_default:
      # NOTE: this rescaling doesn't affect attached hands
      rescale.rescale_humanoid(self, 1.2, 1.2, 70)

    if self._version == '2020':
      position_actuators = _POSITION_ACTUATORS_V2020
    else:
      position_actuators = _POSITION_ACTUATORS
    self._mjcf_root.default.general.forcelimited = 'true'
    # replace the torque motors with scaled position actuators
    for motor in list(self._mjcf_root.actuator.get_children('motor')):
      motor.remove()
    for params in position_actuators:
      associated_joint = self._mjcf_root.find('joint', params.name)
      if hasattr(params, 'damping'):
        associated_joint.damping = params.damping
      actuator = scaled_actuators.add_position_actuator(
          name=params.name, target=associated_joint, kp=params.kp,
          qposrange=associated_joint.range, ctrlrange=(-1, 1),
          forcerange=params.forcerange)
      if self._version == '2020':
        actuator.dyntype = 'filter'
        actuator.dynprm = [0.030]
    limits = zip(*(a.joint.range for a in self.actuators))
    lower, upper = (np.array(limit) for limit in limits)
    self._scale = upper - lower
    self._offset = upper + lower

  @property
  def _xml_path(self):
    return _XML_PATH.format(model_version=self._version)

  def cmu_pose_to_actuation(self, target_pose):
    """Control signal driving joints toward a canonical-CMU-order
    pose (reference cmu_humanoid.py:406-421)."""
    return ((2 * np.asarray(target_pose)[self.actuator_order] -
             self._offset) / self._scale)


class CMUHumanoidPositionControlledV2020(CMUHumanoidPositionControlled):
  """2020 CMU humanoid (rescaled, with a face for head orientation)."""

  def _build(self, **kwargs):
    super()._build(model_version='2020', scale_default=True,
                   include_face=True, **kwargs)

  @property
  def upright_pose(self):
    return base.WalkerPose(xpos=_UPRIGHT_POS_V2020, xquat=_UPRIGHT_QUAT)


class CMUHumanoidObservables(base.WalkerObservables):
  """Observables for the CMU humanoid."""

  @composer.observable
  def body_camera(self):
    return observable.MJCFCamera(self._entity.body_camera, width=64,
                                 height=64)

  @composer.observable
  def egocentric_camera(self):
    return observable.MJCFCamera(self._entity.egocentric_camera,
                                 width=64, height=64)

  @composer.observable
  def head_height(self):
    return observable.MJCFFeature('xpos', self._entity.head, index=2)

  @composer.observable
  def sensors_torque(self):
    sensors = [s for s in
               self._entity.mjcf_model.find_all('sensor')
               if s.tag == 'torque']
    return observable.MJCFFeature(
        'sensordata', sensors,
        corruptor=lambda v, random_state: np.tanh(
            2 * v / _TORQUE_THRESHOLD))

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

  @property
  def proprioception(self):
    return [self.joints_pos, self.joints_vel,
            self.actuator_activation, self.body_height,
            self.end_effectors_pos, self.appendages_pos,
            self.world_zaxis]
