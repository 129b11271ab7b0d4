"""CMU humanoid walkers, spec-driven.

Behavioural counterpart of reference
locomotion/walkers/cmu_humanoid.py (56-dof humanoid converted from the
CMU mocap skeleton, plus position-controlled variants whose [-1, 1]
controls map onto joint ranges through affine-scaled actuators). The
V2019/V2020 model XMLs are reference data (assets/, attributed).

Design: everything version-specific lives in a `_Generation` spec
(asset path, spawn pose, per-joint servo table, activation filter,
rescale policy); the walker classes are thin shells that pick a spec
and delegate part lookup to one declarative table. This replaces the
reference's per-class method forest with data.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Optional, Tuple

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.composer.observation import observable
from dm_control_tpu.locomotion.walkers import base
from dm_control_tpu.locomotion.walkers import rescale
from dm_control_tpu.locomotion.walkers import scaled_actuators

_ASSET_DIR = os.path.join(os.path.dirname(__file__), 'assets')

# Canonical CMU mocap joint order — the clip format's convention, used
# to reindex between actuator order (alphabetical) and clip order.
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

# Per-joint servo strength for the position-controlled variants:
# joint -> (|force limit| == kp). Mined from the reference actuator
# tables (cmu_humanoid.py:53-114); where kp differs from the force
# limit it is listed in _V2019_KP_OVERRIDES.
_V2019_SERVO = {
    'headrx': 20, 'headry': 20, 'headrz': 20,
    'lclaviclery': 20, 'lclaviclerz': 20,
    'lfemurrx': 120, 'lfemurry': 80, 'lfemurrz': 80,
    'lfingersrx': 20, 'lfootrx': 50, 'lfootrz': 50,
    'lhandrx': 20, 'lhandrz': 20,
    'lhumerusrx': 60, 'lhumerusry': 60, 'lhumerusrz': 60,
    'lowerbackrx': 120, 'lowerbackry': 120, 'lowerbackrz': 120,
    'lowerneckrx': 20, 'lowerneckry': 20, 'lowerneckrz': 20,
    'lradiusrx': 60, 'lthumbrx': 20, 'lthumbrz': 20,
    'ltibiarx': 80, 'ltoesrx': 20, 'lwristry': 20,
    'rclaviclery': 20, 'rclaviclerz': 20,
    'rfemurrx': 120, 'rfemurry': 80, 'rfemurrz': 80,
    'rfingersrx': 20, 'rfootrx': 50, 'rfootrz': 50,
    'rhandrx': 20, 'rhandrz': 20,
    'rhumerusrx': 60, 'rhumerusry': 60, 'rhumerusrz': 60,
    'rradiusrx': 60, 'rthumbrx': 20, 'rthumbrz': 20,
    'rtibiarx': 80, 'rtoesrx': 20, 'rwristry': 20,
    'thoraxrx': 80, 'thoraxry': 80, 'thoraxrz': 80,
    'upperbackrx': 80, 'upperbackry': 80, 'upperbackrz': 80,
    'upperneckrx': 20, 'upperneckry': 20, 'upperneckrz': 20,
}
_V2019_KP_OVERRIDES = {
    'lowerbackrx': 150, 'lowerbackry': 150, 'lowerbackrz': 150,
    'thoraxrx': 100, 'thoraxry': 100, 'thoraxrz': 100,
}

# V2020 retune: joint -> (|force limit| == kp, joint damping).
_V2020_SERVO = {
    'headrx': (40, 2), 'headry': (40, 2), 'headrz': (40, 2),
    'lclaviclery': (80, 20), 'lclaviclerz': (80, 20),
    'lfemurrx': (300, 15), 'lfemurry': (200, 10), 'lfemurrz': (200, 10),
    'lfingersrx': (20, 1), 'lfootrx': (120, 6), 'lfootrz': (50, 3),
    'lhandrx': (20, 1), 'lhandrz': (20, 1),
    'lhumerusrx': (120, 6), 'lhumerusry': (120, 6), 'lhumerusrz': (120, 6),
    'lowerbackrx': (300, 15), 'lowerbackry': (180, 20),
    'lowerbackrz': (200, 20),
    'lowerneckrx': (120, 20), 'lowerneckry': (120, 20),
    'lowerneckrz': (120, 20),
    'lradiusrx': (90, 5), 'lthumbrx': (20, 1), 'lthumbrz': (20, 1),
    'ltibiarx': (160, 8), 'ltoesrx': (20, 1), 'lwristry': (20, 1),
    'rclaviclery': (80, 20), 'rclaviclerz': (80, 20),
    'rfemurrx': (300, 15), 'rfemurry': (200, 10), 'rfemurrz': (200, 10),
    'rfingersrx': (20, 1), 'rfootrx': (120, 6), 'rfootrz': (50, 3),
    'rhandrx': (20, 1), 'rhandrz': (20, 1),
    'rhumerusrx': (120, 6), 'rhumerusry': (120, 6), 'rhumerusrz': (120, 6),
    'rradiusrx': (90, 5), 'rthumbrx': (20, 1), 'rthumbrz': (20, 1),
    'rtibiarx': (160, 8), 'rtoesrx': (20, 1), 'rwristry': (20, 1),
    'thoraxrx': (300, 15), 'thoraxry': (80, 8), 'thoraxrz': (200, 12),
    'upperbackrx': (300, 15), 'upperbackry': (80, 8),
    'upperbackrz': (200, 12),
    'upperneckrx': (60, 10), 'upperneckry': (60, 10),
    'upperneckrz': (60, 10),
}

_STAND_HEIGHT = 1.5
_TORQUE_THRESHOLD = 60
_INVIS_GROUP = 1


@dataclasses.dataclass(frozen=True)
class _Generation:
  """Everything that differs between the 2019 and 2020 skeletons."""
  xml: str
  spawn_z: float
  servo: Optional[Mapping[str, Tuple[int, ...]]] = None
  act_filter: Optional[float] = None     # activation filter timeconst
  rescale: Optional[Tuple[float, float, float]] = None
  face: bool = False

  def load(self) -> mjcf.RootElement:
    return mjcf.from_path(os.path.join(_ASSET_DIR, self.xml))


_GEN_2019 = _Generation(xml='humanoid_CMU_V2019.xml', spawn_z=0.94)
_GEN_2019_POS = dataclasses.replace(
    _GEN_2019,
    servo={j: (f, _V2019_KP_OVERRIDES.get(j, f))
           for j, f in _V2019_SERVO.items()})
_GEN_2020_POS = _Generation(
    xml='humanoid_CMU_V2020.xml', spawn_z=1.143,
    servo={j: (f, f, d) for j, (f, d) in _V2020_SERVO.items()},
    act_filter=0.030, rescale=(1.2, 1.2, 70), face=True)

# Semantic part name -> (namespace, identifier). One lookup table
# instead of one property per part.
_PARTS = {
    'root_body': ('body', 'root'),
    'head': ('body', 'head'),
    'left_arm_root': ('body', 'lclavicle'),
    'right_arm_root': ('body', 'rclavicle'),
    'egocentric_camera': ('camera', 'egocentric'),
    'body_camera': ('camera', 'bodycam'),
}
_MARKER_GEOMS = ('rradius', 'lradius')
_END_EFFECTOR_BODIES = ('rradius', 'lradius', 'rfoot', 'lfoot')
_FOOT_BODIES = ('lfoot', 'rfoot')


def _retrofit_servos(root: mjcf.RootElement, gen: _Generation) -> None:
  """Swap the XML's torque motors for [-1,1] position servos.

  Gains/limits come from the generation's servo table; the 2020
  generation additionally retunes joint damping and adds a first-order
  activation filter to every servo.
  """
  root.default.general.forcelimited = 'true'
  for motor in tuple(root.actuator.get_children('motor')):
    motor.remove()
  for jname in sorted(gen.servo):
    entry = gen.servo[jname]
    fmax, kp = entry[0], entry[1]
    joint = root.find('joint', jname)
    if len(entry) > 2:
      joint.damping = entry[2]
    act = scaled_actuators.add_position_actuator(
        name=jname, target=joint, kp=kp, qposrange=joint.range,
        ctrlrange=(-1, 1), forcerange=(-fmax, fmax))
    if gen.act_filter is not None:
      act.dyntype = 'filter'
      act.dynprm = [gen.act_filter]


def _attach_face(root: mjcf.RootElement) -> None:
  """Massless face + nose geoms marking head orientation (2020 model;
  mocap head-tracking rewards need a forward direction)."""
  head = root.find('body', 'head')
  head.add('geom', type='capsule', name='face',
           size=[0.065, 0.014], pos=[0.000341465, 0.048184, 0.01],
           quat=[0.717887, 0.696142, -0.00493334, 0], mass=0.,
           contype=0, conaffinity=0)
  nose_len = np.asarray(root.find('geom', 'head').size)[0] / 4.75
  face_body = head.add(
      'body', name='face', pos=[0.0, 0.039, np.asarray(head.pos)[1] - .02])
  face_body.add('geom', type='capsule', name='nose',
                size=[nose_len, 0.01], pos=[0.0, 0.0, 0.0],
                quat=[1, 0.7, 0, 0], mass=0., contype=0, conaffinity=0,
                group=_INVIS_GROUP)


class CMUHumanoid(base.Walker):
  """A CMU humanoid walker (torque-actuated, V2019 skeleton)."""

  _GEN = _GEN_2019

  def _build(self, name='walker', marker_rgba=None, include_face=False,
             initializer=None):
    gen = self._GEN
    self.set_pose_initializers(initializer)
    self._mjcf_root = gen.load()
    if name:
      self._mjcf_root.model = name
    if marker_rgba is not None:
      for geom in self.marker_geoms:
        geom.rgba = marker_rgba
    if gen.rescale is not None:
      # NOTE: rescaling does not propagate into attached hands
      rescale.rescale_humanoid(self, *gen.rescale)
    if include_face or gen.face:
      _attach_face(self._mjcf_root)
    if gen.servo is not None:
      _retrofit_servos(self._mjcf_root, gen)
      ranges = np.array([a.joint.range for a in self.actuators])
      self._ctrl_scale = ranges[:, 1] - ranges[:, 0]
      self._ctrl_offset = ranges[:, 1] + ranges[:, 0]
    # actuators are declared alphabetically; mocap clips use the
    # canonical CMU order
    self._actuator_order = np.argsort(_CMU_MOCAP_JOINTS)
    self._inverse_order = np.argsort(self._actuator_order)

  def _build_observables(self):
    return CMUHumanoidObservables(self)

  def _part(self, key):
    namespace, ident = _PARTS[key]
    return self._mjcf_root.find(namespace, ident)

  # ---------------- canonical-order plumbing ----------------
  @property
  def mocap_joints(self):
    return tuple(self._mjcf_root.find('joint', n)
                 for n in _CMU_MOCAP_JOINTS)

  @property
  def actuator_order(self):
    """Actuator index -> canonical CMU joint index."""
    return self._actuator_order

  @property
  def actuator_to_joint_order(self):
    """Canonical CMU joint index -> actuator index."""
    return self._inverse_order

  # ---------------- parts ----------------
  @property
  def mjcf_model(self):
    return self._mjcf_root

  @property
  def upright_pose(self):
    return base.WalkerPose(xpos=(0.0, 0.0, self._GEN.spawn_z),
                           xquat=(0.859, 1.0, 1.0, 0.859))

  @property
  def actuators(self):
    return tuple(self._mjcf_root.find_all('actuator'))

  root_body = property(lambda self: self._part('root_body'))
  head = property(lambda self: self._part('head'))
  left_arm_root = property(lambda self: self._part('left_arm_root'))
  right_arm_root = property(lambda self: self._part('right_arm_root'))
  egocentric_camera = property(
      lambda self: self._part('egocentric_camera'))
  body_camera = property(lambda self: self._part('body_camera'))

  @property
  def marker_geoms(self):
    return tuple(self._mjcf_root.find('geom', n) for n in _MARKER_GEOMS)

  @property
  def end_effectors(self):
    return tuple(self._mjcf_root.find('body', n)
                 for n in _END_EFFECTOR_BODIES)

  @property
  def ground_contact_geoms(self):
    geoms = []
    for n in _FOOT_BODIES:
      geoms.extend(self._mjcf_root.find('body', n).get_children('geom'))
    return tuple(geoms)

  @property
  def standing_height(self):
    return _STAND_HEIGHT

  @property
  def observable_joints(self):
    return tuple(a.joint for a in self.actuators
                 if a.get_attributes().get('joint') is not None)

  @property
  def bodies(self):
    return tuple(self._mjcf_root.find_all('body'))

  @property
  def mocap_tracking_bodies(self):
    """All bodies except the root (its pose is the tracking target)."""
    root = self.root_body
    return tuple(b for b in self.bodies if b is not root)


class CMUHumanoidPositionControlled(CMUHumanoid):
  """Position-controlled CMU humanoid, controls scaled to [-1, 1]."""

  _GEN = _GEN_2019_POS

  def _build(self, model_version='2019', **kwargs):
    if model_version == '2020':
      self._GEN = _GEN_2020_POS
    if kwargs.pop('scale_default', False) and self._GEN.rescale is None:
      self._GEN = dataclasses.replace(self._GEN, rescale=(1.2, 1.2, 70))
    super()._build(**kwargs)

  def cmu_pose_to_actuation(self, target_pose):
    """Control signal driving joints toward a canonical-CMU-order pose
    (reference cmu_humanoid.py:406-421: invert the affine ctrl->qpos
    map of each servo)."""
    reordered = np.asarray(target_pose)[self.actuator_order]
    return (2 * reordered - self._ctrl_offset) / self._ctrl_scale


class CMUHumanoidPositionControlledV2020(CMUHumanoidPositionControlled):
  """2020 CMU humanoid (rescaled 1.2x, with a face, filtered servos)."""

  def _build(self, **kwargs):
    kwargs.setdefault('model_version', '2020')
    super()._build(**kwargs)


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
    torque_sensors = [
        s for s in self._entity.mjcf_model.find_all('sensor')
        if s.tag == 'torque']
    squash = lambda v, random_state: np.tanh(2 * v / _TORQUE_THRESHOLD)
    return observable.MJCFFeature('sensordata', torque_sensors,
                                  corruptor=squash)

  @composer.observable
  def actuator_activation(self):
    return observable.MJCFFeature(
        'act', self._entity.mjcf_model.find_all('actuator'))

  @composer.observable
  def appendages_pos(self):
    """End effectors + head, positions in the egocentric frame."""
    def egocentric_appendages(physics):
      appendages = self._entity.end_effectors + (self._entity.head,)
      pos = np.asarray(physics.bind(appendages).xpos)
      root = physics.bind(self._entity.root_body)
      rmat = np.asarray(root.xmat).reshape(3, 3)
      return ((pos - np.asarray(root.xpos)) @ rmat).ravel()
    return observable.Generic(egocentric_appendages)

  @property
  def proprioception(self):
    return [self.joints_pos, self.joints_vel,
            self.actuator_activation, self.body_height,
            self.end_effectors_pos, self.appendages_pos,
            self.world_zaxis]
