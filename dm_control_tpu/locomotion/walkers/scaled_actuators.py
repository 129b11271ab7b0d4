"""Affine-scaled position/velocity actuators
(reference locomotion/walkers/scaled_actuators.py:37-128).

A `<general>` actuator with an affine pre-transform so that the control
range [cmin, cmax] maps onto the target's position (or velocity) range.
"""

_ALLOWED_TAGS = ('joint', 'tendon', 'site')

_DISALLOWED_KWARGS = frozenset([
    'biastype', 'gainprm', 'biasprm', 'ctrllimited', 'joint', 'tendon',
    'site', 'slidersite', 'cranksite'])


def _check_target_and_kwargs(target, **kwargs):
  invalid = _DISALLOWED_KWARGS.intersection(kwargs)
  if invalid:
    raise TypeError(f'got disallowed kwargs: {sorted(invalid)}')
  if target.tag not in _ALLOWED_TAGS:
    raise TypeError(
        f'target must be a joint, tendon or site: got {target}')


def add_position_actuator(target, qposrange, ctrlrange=(-1, 1),
                          kp=1.0, **kwargs):
  """Adds a scaled position actuator bound to `target`."""
  _check_target_and_kwargs(target, **kwargs)
  kwargs[target.tag] = target
  slope = (qposrange[1] - qposrange[0]) / (ctrlrange[1] - ctrlrange[0])
  g0 = kp * slope
  b0 = kp * (qposrange[0] - slope * ctrlrange[0])
  b1 = -kp
  b2 = 0
  return target.root.actuator.add(
      'general', biastype='affine', gainprm=[g0], biasprm=[b0, b1, b2],
      ctrllimited='true', ctrlrange=list(ctrlrange), **kwargs)


def add_velocity_actuator(target, qvelrange, ctrlrange=(-1, 1),
                          kv=1.0, **kwargs):
  """Adds a scaled velocity actuator bound to `target`."""
  _check_target_and_kwargs(target, **kwargs)
  kwargs[target.tag] = target
  slope = (qvelrange[1] - qvelrange[0]) / (ctrlrange[1] - ctrlrange[0])
  g0 = kv * slope
  b0 = kv * (qvelrange[0] - slope * ctrlrange[0])
  b1 = 0
  b2 = -kv
  return target.root.actuator.add(
      'general', biastype='affine', gainprm=[g0], biasprm=[b0, b1, b2],
      ctrllimited='true', ctrlrange=list(ctrlrange), **kwargs)
