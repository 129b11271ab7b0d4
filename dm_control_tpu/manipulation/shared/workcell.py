"""The manipulation "workcell": arena + Jaco arm/hand + spawn regions.

This bundles everything the reference re-wires inline in every task
file (manipulation/{reach,lift,place,bricks}.py) into one composed
object: the standard arena, the arm with the hand attached at the
task's offset, the TCP pose initializer, the front camera observable,
and color-coded spawn-region debug sites. Tasks subclass WorkcellTask
and only add their props, rewards, and episode logic.
"""

from __future__ import annotations

from dm_control_tpu import composer
from dm_control_tpu.composer import initializers
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.manipulation.shared import arenas
from dm_control_tpu.manipulation.shared import cameras
from dm_control_tpu.manipulation.shared import constants
from dm_control_tpu.manipulation.shared import observations
from dm_control_tpu.manipulation.shared import robots
from dm_control_tpu.manipulation.shared import workspaces

# region name -> debug site color
_REGION_COLORS = {
    'tcp': constants.GREEN,
    'prop': constants.BLUE,
    'target': constants.BLUE,
    'pedestal': constants.CYAN,
}


class Workcell:
  """Arena + arm + hand + TCP initializer + main camera, pre-wired."""

  def __init__(self, obs_settings: observations.ObservationSettings,
               tcp_bbox: workspaces.BoundingBox,
               arm_offset=robots.ARM_OFFSET):
    self.obs_settings = obs_settings
    self.arena = arenas.Standard()
    self.arm = robots.make_arm(obs_settings=obs_settings)
    self.hand = robots.make_hand(obs_settings=obs_settings)
    self.arm.attach(self.hand)
    self.arena.attach_offset(self.arm, offset=arm_offset)
    self.tcp_initializer = initializers.ToolCenterPointInitializer(
        self.hand, self.arm,
        position=distributions.Uniform(*tcp_bbox),
        quaternion=workspaces.DOWN_QUATERNION)
    self.camera_observables = cameras.add_camera_observables(
        self.arena, obs_settings, cameras.FRONT_CLOSE)
    self.mark_region('tcp', tcp_bbox, name='tcp_spawn_area')

  def mark_region(self, kind, bbox, name):
    """Adds an invisible site visualizing a spawn region."""
    return workspaces.add_bbox_site(
        body=self.arena.mjcf_model.worldbody,
        lower=bbox.lower, upper=bbox.upper,
        rgba=_REGION_COLORS[kind], name=name)

  def add_free_prop(self, prop):
    """Attaches `prop` with a freejoint; returns the attachment frame."""
    return self.arena.add_free_entity(prop)

  def prop_options(self):
    """Observable options for free props under these settings."""
    return observations.make_options(
        self.obs_settings, observations.FREEPROP_OBSERVABLES)

  def configure_prop_pose(self, observables_dict):
    """Applies the prop_pose spec to each observable in a dict."""
    for obs in observables_dict.values():
      obs.configure(**self.obs_settings.prop_pose._asdict())

  def reset_hand(self, physics, random_state):
    """Random grasp aperture + TCP pose, the shared episode-init step."""
    self.hand.set_grasp(physics, close_factors=random_state.uniform())
    self.tcp_initializer(physics, random_state)


class WorkcellTask(composer.Task):
  """Base for manipulation tasks built on a Workcell."""

  def __init__(self, cell: Workcell,
               control_timestep=constants.CONTROL_TIMESTEP):
    self._cell = cell
    self.control_timestep = control_timestep
    self._task_observables = dict(cell.camera_observables)

  @property
  def cell(self):
    return self._cell

  @property
  def root_entity(self):
    return self._cell.arena

  @property
  def arm(self):
    return self._cell.arm

  @property
  def hand(self):
    return self._cell.hand

  @property
  def task_observables(self):
    return self._task_observables
