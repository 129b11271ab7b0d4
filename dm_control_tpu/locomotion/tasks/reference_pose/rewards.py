# Reward formulas/coefficients reproduce the CoMic task spec from
# dm_control (github.com/google-deepmind/dm_control), Copyright The
# dm_control Authors, Apache License 2.0.
"""Reward functions for reference-pose tracking tasks.

Behavioral contract: reference locomotion/tasks/reference_pose/
rewards.py — the CoMic reward family (Hasenclever et al. 2020). The
per-term weight/scale coefficients ARE the task spec and live in one
table; the term evaluation is a single pass over it.
"""

import collections

import numpy as np

RewardFnOutput = collections.namedtuple(
    'RewardFnOutput', ['reward', 'debug', 'reward_terms'])

# pose-tracking terms: feature key -> (weight, error scale);
# each contributes weight * exp(-scale * squared_error)
_POSE_TERMS = {
    'center_of_mass': (0.1, 10.),
    'joints_velocity': (1.0, 0.1),
    'appendages': (0.15, 40.),
    'body_quaternions': (0.65, 2.),
}


def bounded_quat_dist(source, target):
  """Quaternion distance bounded to [0, pi/2], batched over leading
  dims; antipodal quaternions count as identical."""
  def unit(q):
    q = np.asarray(q, dtype=float)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)
  cos_like = 2 * np.einsum('...i,...i', unit(source), unit(target)) ** 2 - 1
  return 0.5 * np.arccos(np.minimum(1., cos_like))[..., np.newaxis]


def sort_dict(d):
  return collections.OrderedDict(sorted(d.items()))


def compute_squared_differences(walker_features, reference_features,
                                exclude_keys=()):
  """Per-feature squared error (quaternions via bounded distance)."""
  out = {}
  for key, walker_value in walker_features.items():
    if key in exclude_keys:
      continue
    ref_value = reference_features[key]
    if 'quaternion' not in key:
      err = np.sum((walker_value - ref_value) ** 2)
    elif 'quaternions' in key:
      err = np.sum(bounded_quat_dist(walker_value, ref_value) ** 2)
    else:
      err = bounded_quat_dist(walker_value, ref_value) ** 2
    out[key] = err
  return out


def termination_reward_fn(termination_error, termination_error_threshold,
                          **unused_kwargs):
  """1 - error/threshold; lives in [0, 1] under the task's truncation."""
  reward = 1 - termination_error / termination_error_threshold
  return RewardFnOutput(
      reward=reward,
      debug={'termination_error': termination_error,
             'termination_error_threshold': termination_error_threshold},
      reward_terms=sort_dict({'termination': reward}))


def debug(reference_features, walker_features, **unused_kwargs):
  return RewardFnOutput(
      reward=0.0,
      debug=compute_squared_differences(walker_features,
                                        reference_features),
      reward_terms=None)


def multi_term_pose_reward_fn(walker_features, reference_features,
                              **unused_kwargs):
  """Sum of the _POSE_TERMS exponential tracking bonuses."""
  errors = compute_squared_differences(walker_features,
                                       reference_features)
  terms = {key: weight * np.exp(-scale * errors[key])
           for key, (weight, scale) in _POSE_TERMS.items()}
  return RewardFnOutput(reward=sum(terms.values()), debug=terms,
                        reward_terms=sort_dict(terms))


def comic_reward_fn(termination_error, termination_error_threshold,
                    walker_features, reference_features, **unused_kwargs):
  """Even mix of the termination and multi-term pose rewards (CoMic)."""
  halves = (termination_reward_fn(termination_error,
                                  termination_error_threshold),
            multi_term_pose_reward_fn(walker_features,
                                      reference_features))
  debug_terms = {}
  reward_terms = {}
  for part in halves:
    debug_terms.update(part.debug)
    reward_terms.update(
        (k, 0.5 * v) for k, v in part.reward_terms.items())
  return RewardFnOutput(
      reward=0.5 * (halves[0].reward + halves[1].reward),
      debug=debug_terms, reward_terms=sort_dict(reward_terms))


_REWARD_FN = {
    'termination_reward': termination_reward_fn,
    'multi_term_pose_reward': multi_term_pose_reward_fn,
    'comic': comic_reward_fn,
}

_REWARD_CHANNELS = {
    'termination_reward': ('termination',),
    'multi_term_pose_reward': tuple(sorted(_POSE_TERMS)),
    'comic': tuple(sorted(('termination',) + tuple(_POSE_TERMS))),
}


def _lookup(table, reward_key):
  try:
    return table[reward_key]
  except KeyError:
    raise ValueError(f'Requested reward {reward_key}, which is not a '
                     'valid option.') from None


def get_reward(reward_key):
  return _lookup(_REWARD_FN, reward_key)


def get_reward_channels(reward_key):
  return _lookup(_REWARD_CHANNELS, reward_key)
