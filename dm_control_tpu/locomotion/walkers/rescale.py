"""Walker rescaling.

Behavioral contract: reference locomotion/walkers/rescale.py —
recursively scale positions/sizes (and fromto capsule segments)
through an MJCF subtree, plus humanoid total-mass retargeting.
"""

import numpy as np


def _scale_fromto(element, position_factor, size_factor):
  """fromto encodes both placement (midpoint) and extent (half-span);
  scale them independently."""
  fromto = np.asarray(element.fromto, dtype=float)
  mid = 0.5 * (fromto[3:] + fromto[:3]) * position_factor
  half = 0.5 * (fromto[3:] - fromto[:3]) * size_factor
  element.fromto = np.concatenate([mid - half, mid + half])


def rescale_subtree(body, position_factor, size_factor):
  """Recursively rescales an entire subtree of an MJCF model."""
  for child in body.all_children():
    if child.tag == 'sensor':
      continue
    attrs = child.get_attributes()
    if attrs.get('fromto') is not None:
      _scale_fromto(child, position_factor, size_factor)
    if attrs.get('pos') is not None:
      child.pos = np.asarray(child.pos, dtype=float) * position_factor
    if attrs.get('size') is not None:
      child.size = np.asarray(child.size, dtype=float) * size_factor
    if child.tag in ('body', 'worldbody'):
      rescale_subtree(child, position_factor, size_factor)


def _retarget_mass(walker, target_mass):
  from dm_control_tpu import mjcf
  physics = mjcf.Physics.from_mjcf_model(walker.mjcf_model)
  factor = target_mass / float(np.asarray(
      physics.bind(walker.root_body).subtreemass))
  for geom in walker.mjcf_model.find_all('geom'):
    attrs = geom.get_attributes()
    if attrs.get('mass') is not None:
      geom.mass = float(geom.mass) * factor
    else:
      density = attrs.get('density')
      geom.density = (float(density) if density is not None
                      else 1000.) * factor


def rescale_humanoid(walker, position_factor, size_factor=None,
                     mass=None):
  """Rescales a humanoid walker's lengths, sizes, and masses."""
  subtree_root = walker.mjcf_model.find('body', 'root').parent
  rescale_subtree(subtree_root, position_factor,
                  position_factor if size_factor is None
                  else size_factor)
  if mass is not None:
    _retarget_mass(walker, mass)
