"""Round-4 walker additions: fruitfly, jumping ball, initializers.

Model: reference locomotion/walkers/fruitfly_v2_test.py and
jumping_ball usage in soccer tests.
"""

import numpy as np
import pytest

from dm_control_tpu import mjcf
from dm_control_tpu.locomotion.arenas import floors
from dm_control_tpu.locomotion.walkers import initializers
from dm_control_tpu.locomotion.walkers import jumping_ball


def test_jumping_ball_builds_and_steps():
  walker = jumping_ball.JumpingBallWithHead(add_ears=True,
                                            marker_rgba=(0, 0, 1, 1))
  arena = floors.Floor()
  walker.create_root_joints(arena.attach(walker))
  physics = mjcf.Physics.from_mjcf_model(arena.mjcf_model)
  walker.set_pose(physics, position=(1., 2., 0.3),
                  quaternion=(np.cos(0.3), 0, 0, np.sin(0.3)))
  physics.forward()
  assert len(walker.actuators) >= 3
  physics.step()


def test_rolling_ball_drops_kick():
  walker = jumping_ball.RollingBallWithHead()
  names = [a.name for a in walker.mjcf_model.find_all('actuator')]
  assert 'kick' not in names
  assert walker.observable_joints == []


def test_initializers_protocol():
  recorded = []

  class Probe(initializers.WalkerInitializer):
    def initialize_pose(self, physics, walker, random_state):
      recorded.append('probe')

  multi = initializers.RandomlySampledInitializer([Probe()])
  multi.initialize_pose(None, None, np.random.RandomState(0))
  initializers.NoOpInitializer().initialize_pose(None, None, None)
  assert recorded == ['probe']


@pytest.mark.heavy
def test_fruitfly_builds_and_steps():
  from dm_control_tpu.locomotion.walkers import fruitfly_v2
  fly = fruitfly_v2.FruitFly()
  arena = floors.Floor()
  spawn = arena.attach(fly)
  spawn.add('freejoint')
  physics = mjcf.Physics.from_mjcf_model(arena.mjcf_model)
  spec = fly.get_action_spec(physics)
  # legs 48 + head 3 + abdomen 2 with the default flags
  assert spec.shape[0] >= 50
  fly.apply_action(physics, np.zeros(spec.shape), None)
  physics.step()
  assert np.isfinite(np.asarray(physics.data.qpos)).all()


@pytest.mark.heavy
def test_soccer_humanoid_walker_builds():
  from dm_control_tpu.locomotion.soccer import humanoid
  walker = humanoid.Humanoid(
      visual=humanoid.Humanoid.Visual.JERSEY, walker_id=3,
      marker_rgba=(0.9, 0.1, 0.1, 1))
  assert walker.walker_id == 3
  assert walker.marker_geoms
  with pytest.raises(ValueError):
    humanoid.Humanoid(visual=humanoid.Humanoid.Visual.JERSEY,
                      walker_id=None)
