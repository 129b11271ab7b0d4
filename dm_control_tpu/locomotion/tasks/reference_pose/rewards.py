"""Reward functions for reference-pose tracking tasks.

Numerical contract matches the reference
(dm_control/locomotion/tasks/reference_pose/rewards.py:38-187): the
reward formulas ARE the task spec (CoMic, Hasenclever et al. 2020), so
the coefficients are identical; the implementation is vectorised numpy
over the SoA feature dicts.
"""

import collections

import numpy as np

RewardFnOutput = collections.namedtuple(
    'RewardFnOutput', ['reward', 'debug', 'reward_terms'])


def bounded_quat_dist(source, target):
  """Quaternion distance bounded to [0, pi/2], batched over leading dims."""
  source = np.asarray(source, dtype=float)
  target = np.asarray(target, dtype=float)
  source = source / np.linalg.norm(source, axis=-1, keepdims=True)
  target = target / np.linalg.norm(target, axis=-1, keepdims=True)
  dist = 2 * np.einsum('...i,...i', source, target) ** 2 - 1
  dist = np.minimum(1., dist)
  return 0.5 * np.arccos(dist)[..., np.newaxis]


def sort_dict(d):
  return collections.OrderedDict(sorted(d.items()))


def compute_squared_differences(walker_features, reference_features,
                                exclude_keys=()):
  """Per-feature squared differences (quaternions via bounded distance)."""
  squared_differences = {}
  for k in walker_features:
    if k in exclude_keys:
      continue
    if 'quaternion' not in k:
      squared_differences[k] = np.sum(
          (walker_features[k] - reference_features[k]) ** 2)
    elif 'quaternions' in k:
      quat_dists = bounded_quat_dist(walker_features[k],
                                     reference_features[k])
      squared_differences[k] = np.sum(quat_dists ** 2)
    else:
      squared_differences[k] = bounded_quat_dist(
          walker_features[k], reference_features[k]) ** 2
  return squared_differences


def termination_reward_fn(termination_error, termination_error_threshold,
                          **unused_kwargs):
  """1 - error/threshold; lives in [0, 1] under the task's truncation."""
  debug_terms = {
      'termination_error': termination_error,
      'termination_error_threshold': termination_error_threshold,
  }
  termination_reward = 1 - termination_error / termination_error_threshold
  return RewardFnOutput(
      reward=termination_reward, debug=debug_terms,
      reward_terms=sort_dict({'termination': termination_reward}))


def debug(reference_features, walker_features, **unused_kwargs):
  debug_terms = compute_squared_differences(walker_features,
                                            reference_features)
  return RewardFnOutput(reward=0.0, debug=debug_terms, reward_terms=None)


def multi_term_pose_reward_fn(walker_features, reference_features,
                              **unused_kwargs):
  """CoM + body-quaternion + joint-velocity + appendage tracking terms."""
  differences = compute_squared_differences(walker_features,
                                            reference_features)
  terms = {
      'center_of_mass': .1 * np.exp(-10 * differences['center_of_mass']),
      'joints_velocity': 1.0 * np.exp(-0.1 * differences['joints_velocity']),
      'appendages': 0.15 * np.exp(-40. * differences['appendages']),
      'body_quaternions': 0.65 * np.exp(-2 * differences['body_quaternions']),
  }
  reward = sum(terms.values())
  return RewardFnOutput(reward=reward, debug=terms,
                        reward_terms=sort_dict(terms))


def comic_reward_fn(termination_error, termination_error_threshold,
                    walker_features, reference_features, **unused_kwargs):
  """Even mix of the termination and multi-term pose rewards (CoMic)."""
  termination_reward, debug_terms, termination_reward_terms = (
      termination_reward_fn(termination_error, termination_error_threshold))
  mt_reward, mt_debug_terms, mt_reward_terms = multi_term_pose_reward_fn(
      walker_features, reference_features)
  debug_terms.update(mt_debug_terms)
  reward_terms = {k: 0.5 * v for k, v in termination_reward_terms.items()}
  reward_terms.update({k: 0.5 * v for k, v in mt_reward_terms.items()})
  return RewardFnOutput(
      reward=0.5 * termination_reward + 0.5 * mt_reward,
      debug=debug_terms,
      reward_terms=sort_dict(reward_terms))


_REWARD_FN = {
    'termination_reward': termination_reward_fn,
    'multi_term_pose_reward': multi_term_pose_reward_fn,
    'comic': comic_reward_fn,
}

_REWARD_CHANNELS = {
    'termination_reward': ('termination',),
    'multi_term_pose_reward':
        ('appendages', 'body_quaternions', 'center_of_mass',
         'joints_velocity'),
    'comic': ('appendages', 'body_quaternions', 'center_of_mass',
              'termination', 'joints_velocity'),
}


def get_reward(reward_key):
  if reward_key not in _REWARD_FN:
    raise ValueError('Requested reward %s, which is not a valid option.'
                     % reward_key)
  return _REWARD_FN[reward_key]


def get_reward_channels(reward_key):
  if reward_key not in _REWARD_CHANNELS:
    raise ValueError('Requested reward %s, which is not a valid option.'
                     % reward_key)
  return _REWARD_CHANNELS[reward_key]
