"""Manipulation stack: registry, Jaco entities, end-to-end episodes.

Model: reference manipulation/manipulation_test.py (episode smoke over
the registry) + entities/manipulators/kinova/kinova_test.py (entity
structure).
"""

import numpy as np
import pytest

from dm_control_tpu import manipulation


def test_registry_names_match_reference():
  # the 25 task names of reference manipulation/__init__.py's registry
  expected = {
      'stack_2_bricks_features', 'stack_2_bricks_vision',
      'stack_2_bricks_moveable_base_features',
      'stack_2_bricks_moveable_base_vision', 'stack_3_bricks_features',
      'stack_3_bricks_vision', 'stack_3_bricks_random_order_features',
      'stack_2_of_3_bricks_random_order_features',
      'stack_2_of_3_bricks_random_order_vision',
      'reassemble_3_bricks_fixed_order_features',
      'reassemble_3_bricks_fixed_order_vision',
      'reassemble_5_bricks_random_order_features',
      'reassemble_5_bricks_random_order_vision', 'lift_brick_features',
      'lift_brick_vision', 'lift_large_box_features',
      'lift_large_box_vision', 'place_brick_features',
      'place_brick_vision', 'place_cradle_features',
      'place_cradle_vision', 'reach_duplo_features',
      'reach_duplo_vision', 'reach_site_features', 'reach_site_vision'}
  assert set(manipulation.ALL) == expected
  assert set(manipulation.TAGS) == {'features', 'vision', 'easy'}
  assert 'reach_site_features' in manipulation.get_environments_by_tag(
      'features')


def test_jaco_arm_compile_parity():
  """Arm+hand assembly compiles identically in both engines."""
  import mujoco
  from dm_control_tpu.entities.manipulators import kinova
  arm = kinova.JacoArm()
  hand = kinova.JacoHand(use_pinch_site_as_tcp=True)
  arm.attach(hand)
  xml = arm.mjcf_model.to_xml_string()
  assets = arm.mjcf_model.get_assets()
  mc = mujoco.MjModel.from_xml_string(xml, assets)
  from dm_control_tpu import models as M
  import warnings
  with warnings.catch_warnings():
    warnings.simplefilter('ignore')
    m = M.from_xml_string(xml, assets=assets)
  assert m.nv == mc.nv == 9
  assert m.nu == mc.nu == 9
  np.testing.assert_allclose(np.asarray(m.body_mass), mc.body_mass,
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(m.jnt_range), mc.jnt_range,
                             atol=1e-6)
  np.testing.assert_allclose(
      np.asarray(m.actuator_gainprm)[:, 0], mc.actuator_gainprm[:, 0])


_FEATURE_TASKS = sorted(n for n in manipulation.ALL
                        if n.endswith('_features'))


@pytest.mark.heavy
@pytest.mark.parametrize('name', _FEATURE_TASKS)
def test_episode_sweep_features(name):
  """Every registered feature task builds, resets, and steps."""
  env = manipulation.load(name, seed=7)
  ts = env.reset()
  assert ts.first()
  spec = env.action_spec()
  for _ in range(2):
    ts = env.step(np.zeros(spec.shape, spec.dtype))
    assert np.isfinite(ts.reward)
    assert 0.0 <= ts.reward <= 1.0


@pytest.mark.parametrize('name', ['reach_site_features',
                                  'lift_brick_features'])
def test_episode_runs(name):
  env = manipulation.load(name, seed=99)
  ts = env.reset()
  assert ts.first()
  spec = env.action_spec()
  assert spec.shape == (9,)
  rng = np.random.RandomState(0)
  for _ in range(3):
    action = rng.uniform(spec.minimum, spec.maximum, spec.shape)
    ts = env.step(action)
    assert np.isfinite(ts.reward)
    assert 0.0 <= ts.reward <= 1.0
  for key, value in ts.observation.items():
    assert np.all(np.isfinite(np.asarray(value, dtype=float))), key
