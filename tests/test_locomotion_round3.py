"""Round-3 locomotion additions: Bowl arena, Escape, TwoTouch reach,
PaddedRoom."""

import functools

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.locomotion.arenas import bowl
from dm_control_tpu.locomotion.arenas import floors
from dm_control_tpu.locomotion.arenas import padded_room
from dm_control_tpu.locomotion.props import target_sphere
from dm_control_tpu.locomotion.tasks import escape as escape_lib
from dm_control_tpu.locomotion.tasks import reach as reach_lib
from dm_control_tpu.locomotion.walkers import ant


def test_padded_room_layout():
  room = padded_room.PaddedRoom(room_size=5, num_objects=2,
                                random_state=np.random.RandomState(0))
  layer = room.entity_layer
  rows = layer.strip('\n').split('\n')
  assert len(rows) == room.height == 9
  assert all(len(r) == room.width for r in rows)
  assert rows[0] == '*' * 9 and rows[-1] == '*' * 9
  assert layer.count('P') == 1 and layer.count('G') == 2


def test_escape_bowl_ant():
  task = escape_lib.Escape(
      walker=ant.Ant(),
      arena=bowl.Bowl(size=(10, 10)),
      physics_timestep=0.005,
      control_timestep=0.05)
  env = composer.Environment(task=task, random_state=11,
                             strip_singleton_obs_buffer_dim=True)
  ts = env.reset()
  assert 'walker/origin' in ts.observation, sorted(ts.observation)
  # bowl terrain was written into the device model
  hdata = np.array(env.physics.model.hfield_data)
  assert hdata.max() > 0.1 and hdata.min() >= 0.0
  spec = env.action_spec()
  rewards = []
  for _ in range(3):
    ts = env.step(np.zeros(spec.shape))
    rewards.append(ts.reward)
  assert all(np.isfinite(r) for r in rewards)
  # walker starts inside the bowl: escape reward ~0, upright in [0, 1]
  assert all(0.0 <= r <= 1.0 for r in rewards)


def test_two_touch_reach_ant():
  task = reach_lib.TwoTouch(
      walker=ant.Ant(),
      arena=floors.Floor(),
      target_builders=[
          functools.partial(target_sphere.TargetSphereTwoTouch,
                            radius=0.4, height_above_ground=0.08),
      ],
      target_type_rewards=[25.],
      physics_timestep=0.005,
      control_timestep=0.05)
  env = composer.Environment(task=task, random_state=5,
                             strip_singleton_obs_buffer_dim=True)
  ts = env.reset()
  assert 'task_logic' in ts.observation, sorted(ts.observation)
  spec = env.action_spec()
  for _ in range(3):
    ts = env.step(np.zeros(spec.shape))
    assert np.isfinite(ts.reward)
  assert ts.observation['task_logic'][-1] in (
      reach_lib.TwoTouchState.PRE_TOUCH,
      reach_lib.TwoTouchState.TOUCHED_ONCE,
      reach_lib.TwoTouchState.TOUCHED_TWICE)


def test_two_touch_prop_latches():
  prop = target_sphere.TargetSphereTwoTouch(radius=0.5)
  assert prop.activated == (False, False)
  prop._touched_once = True
  prop.reset()
  assert prop.activated == (False, False)
