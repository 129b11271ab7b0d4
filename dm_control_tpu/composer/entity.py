"""Entity: the composable building block of composer environments.

Behavioural counterpart of reference dm_control/composer/entity.py:
202-605 — an Entity owns an mjcf model, exposes lifecycle hooks, can be
attached to other entities, and declares observables via an
`Observables` companion class scanned for @define.observable methods.
"""

from __future__ import annotations

import abc
import collections
from typing import Optional, Sequence

import numpy as np

from dm_control_tpu import mjcf
from dm_control_tpu.composer import define
from dm_control_tpu.utils import transformations

_OBSERVABLE = define.observable


class Observables:
  """Container of an entity's observables."""

  def __init__(self, entity):
    self._entity = entity
    self._observables = collections.OrderedDict()
    self._keys_helper = None
    for cls in reversed(type(self).__mro__):
      for name, attr in cls.__dict__.items():
        if isinstance(attr, define.observable):
          self._observables[name] = getattr(self, name)

  @property
  def entity(self):
    return self._entity

  def as_dict(self, fully_qualified: bool = True):
    if not fully_qualified:
      return collections.OrderedDict(self._observables)
    prefix = self._entity.mjcf_model.model
    return collections.OrderedDict(
        (f'{prefix}/{k}', v) for k, v in self._observables.items())

  def add_observable(self, name, observable, enabled=False):
    """Registers an extra observable on this entity at runtime
    (reference composer/entity.py Observables.add_observable)."""
    self._observables[name] = observable
    observable.enabled = enabled

  def __getitem__(self, name):
    return self._observables[name]

  def __iter__(self):
    return iter(self._observables)

  def enable_all(self):
    for obs in self._observables.values():
      obs.enabled = True

  def disable_all(self):
    for obs in self._observables.values():
      obs.enabled = False

  def set_options(self, options):
    if options is None:
      return
    for key, config in options.items():
      self._observables[key].configure(**config)


class FreePropObservableMixin:
  """Mixin marking entities whose pose should be observable."""


class Entity(abc.ABC):
  """Base class for all composer entities."""

  def __init__(self, *args, **kwargs):
    self._post_init_hooks = []
    self._parent = None
    self._attached = []
    # reference entity.py:212-227: every entity accepts
    # `observable_options`, applied after _build_observables
    observable_options = kwargs.pop('observable_options', None)
    self._build(*args, **kwargs)
    self._observables = self._build_observables()
    self._observables.set_options(observable_options)

  # ---------------- construction protocol ----------------
  @abc.abstractmethod
  def _build(self, *args, **kwargs):
    """Entity initialization: must create self._mjcf_root."""

  def _build_observables(self) -> Observables:
    return Observables(self)

  @property
  @abc.abstractmethod
  def mjcf_model(self) -> mjcf.RootElement:
    """The entity's mjcf root element."""

  @property
  def observables(self) -> Observables:
    return self._observables

  # ---------------- lifecycle hooks (environment.py order) ----------
  def initialize_episode_mjcf(self, random_state):
    pass

  def after_compile(self, physics, random_state):
    pass

  def initialize_episode(self, physics, random_state):
    pass

  def before_step(self, physics, random_state):
    pass

  def before_substep(self, physics, random_state):
    pass

  def after_substep(self, physics, random_state):
    pass

  def after_step(self, physics, random_state):
    pass

  # ---------------- attachment ----------------
  @property
  def attachment_site(self):
    """Default site other entities attach onto (reference
    entity.py:300-310); None = the model's worldbody."""
    return None

  def attach(self, entity: 'Entity',
             attach_site=None) -> mjcf.Element:
    """Attaches a child entity; returns the attachment frame."""
    if attach_site is None:
      attach_site = self.attachment_site
    frame = self.mjcf_model.attach(entity.mjcf_model, site=attach_site)
    entity._parent = self
    entity._attachment_frame = frame
    self._attached.append(entity)
    return frame

  @property
  def parent_frame(self):
    """The attachment-frame body in the parent model, if attached."""
    return getattr(self, '_attachment_frame', None)

  def detach(self):
    if self._parent is None:
      raise RuntimeError('entity is not attached')
    self._parent._attached.remove(self)
    if getattr(self.mjcf_model, '_parent_root', None) is not None:
      self.mjcf_model.detach()
    self._attachment_frame = None
    self._parent = None

  @property
  def parent(self):
    return self._parent

  def iter_entities(self, exclude_self: bool = False):
    if not exclude_self:
      yield self
    for child in self._attached:
      yield from child.iter_entities()

  # ---------------- pose ----------------
  @property
  def root_body(self):
    bodies = self.mjcf_model.worldbody.get_children('body')
    return bodies[0] if bodies else None

  def _free_joints(self):
    """Freejoints controlling this entity: on its own root body or on
    its attachment frame (reference entity.py:417-579)."""
    candidates = []
    root = self.root_body
    if root is not None:
      candidates.extend(root.get_children('freejoint') +
                        root.get_children('joint'))
    frame = self.parent_frame
    if frame is not None:
      candidates.extend(frame.get_children('freejoint') +
                        frame.get_children('joint'))
    return [j for j in candidates
            if j.tag == 'freejoint' or j.type == 'free']

  def set_pose(self, physics, position=None, quaternion=None) -> None:
    """Sets the entity's (free or fixed) pose in world."""
    freejoints = self._free_joints()
    if freejoints:
      joint = freejoints[0]
      binding = physics.bind(joint)
      qpos = np.array(binding.qpos)
      if position is not None:
        qpos[:3] = position
      if quaternion is not None:
        qpos[3:7] = quaternion
      binding.qpos = qpos
    else:
      target = self.parent_frame or self.root_body
      binding = physics.bind(target)
      if position is not None:
        binding.pos = np.asarray(position)
      if quaternion is not None:
        binding.quat = np.asarray(quaternion)

  def get_pose(self, physics):
    # attached entities report their attachment frame's pose
    # (reference entity.py:417-466 uses mjcf.get_attachment_frame)
    target = self.parent_frame or self.root_body
    binding = physics.bind(target)
    return np.array(binding.xpos), np.array(binding.xquat)

  def shift_pose(self, physics, position=None, quaternion=None,
                 rotate_velocity=False):
    """Shifts pose; optionally rotates the linear velocity with the
    orientation shift (reference entity.py shift_pose)."""
    pos, quat = self.get_pose(physics)
    new_pos = pos + position if position is not None else None
    new_quat = (np.asarray(transformations.quat_mul(quaternion, quat))
                if quaternion is not None else None)
    if quaternion is not None and rotate_velocity:
      velocity, angular = self.get_velocity(physics)
      rotated = transformations.quat_rotate(
          np.asarray(quaternion, dtype=float), np.asarray(velocity))
      self.set_velocity(physics, velocity=rotated,
                        angular_velocity=angular)
    self.set_pose(physics, new_pos, new_quat)

  def get_velocity(self, physics):
    """(linear, angular) velocity of the entity's free joint."""
    freejoints = self._free_joints()
    if not freejoints:
      raise ValueError('entity has no free joint')
    qvel = np.array(physics.bind(freejoints[0]).qvel)
    return qvel[:3], qvel[3:6]

  def set_velocity(self, physics, velocity=None,
                   angular_velocity=None):
    freejoints = self._free_joints()
    if not freejoints:
      raise ValueError('entity has no free joint')
    binding = physics.bind(freejoints[0])
    qvel = np.array(binding.qvel)
    if velocity is not None:
      qvel[:3] = velocity
    if angular_velocity is not None:
      qvel[3:6] = angular_velocity
    binding.qvel = qvel

  def global_vector_to_local_frame(self, physics, vec_in_world_frame):
    xmat = np.array(physics.bind(self.root_body).xmat).reshape(3, 3)
    vec = np.asarray(vec_in_world_frame)
    return vec[..., :3] @ xmat


class ModelWrapperEntity(Entity):
  """Wraps a bare mjcf model as an entity (entity.py:597 parity)."""

  def _build(self, mjcf_model):
    self._mjcf_root = mjcf_model

  @property
  def mjcf_model(self):
    return self._mjcf_root
