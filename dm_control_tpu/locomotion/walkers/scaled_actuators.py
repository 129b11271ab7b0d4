"""Affine-scaled position/velocity actuators.

Behavioral contract: reference locomotion/walkers/scaled_actuators.py —
a `<general>` actuator whose affine gain/bias maps the control range
onto a target position (or velocity) range with P-gain `kp` (or D-gain
`kv`). Both flavors share one builder; they differ only in which
feedback slot of biasprm carries the negative gain.
"""

_ALLOWED_TAGS = ('joint', 'tendon', 'site')

_RESERVED_KWARGS = frozenset([
    'biastype', 'gainprm', 'biasprm', 'ctrllimited', 'joint', 'tendon',
    'site', 'slidersite', 'cranksite'])


def _scaled_general_actuator(target, output_range, ctrlrange, gain,
                             feedback_slot, kwargs):
  """general actuator: gain*(a*ctrl+b) - gain*feedback, with (a, b)
  the affine map ctrlrange -> output_range. feedback_slot 1 reads
  position, 2 reads velocity."""
  bad = _RESERVED_KWARGS.intersection(kwargs)
  if bad:
    raise TypeError(f'got disallowed kwargs: {sorted(bad)}')
  if target.tag not in _ALLOWED_TAGS:
    raise TypeError(
        f'target must be a joint, tendon or site: got {target}')
  (c0, c1), (o0, o1) = ctrlrange, output_range
  slope = (o1 - o0) / (c1 - c0)
  biasprm = [gain * (o0 - slope * c0), 0., 0.]
  biasprm[feedback_slot] = -gain
  return target.root.actuator.add(
      'general', biastype='affine', gainprm=[gain * slope],
      biasprm=biasprm, ctrllimited='true', ctrlrange=list(ctrlrange),
      **{target.tag: target}, **kwargs)


def add_position_actuator(target, qposrange, ctrlrange=(-1, 1),
                          kp=1.0, **kwargs):
  """Adds an actuator servoing `target`'s position over `qposrange`."""
  return _scaled_general_actuator(target, qposrange, ctrlrange, kp,
                                  feedback_slot=1, kwargs=kwargs)


def add_velocity_actuator(target, qvelrange, ctrlrange=(-1, 1),
                          kv=1.0, **kwargs):
  """Adds an actuator servoing `target`'s velocity over `qvelrange`."""
  return _scaled_general_actuator(target, qvelrange, ctrlrange, kv,
                                  feedback_slot=2, kwargs=kwargs)
