"""Walker rescaling (reference locomotion/walkers/rescale.py:15-60)."""

import numpy as np


def rescale_subtree(body, position_factor, size_factor):
  """Recursively rescales an entire subtree of an MJCF model."""
  for child in body.all_children():
    if child.tag == 'sensor':
      continue
    fromto = child.get_attributes().get('fromto')
    if fromto is not None:
      fromto = np.asarray(fromto, dtype=float)
      new_pos = position_factor * 0.5 * (fromto[3:] + fromto[:3])
      new_size = size_factor * 0.5 * (fromto[3:] - fromto[:3])
      child.fromto = np.concatenate([new_pos - new_size,
                                     new_pos + new_size])
    if child.get_attributes().get('pos') is not None:
      child.pos = np.asarray(child.pos, dtype=float) * position_factor
    if child.get_attributes().get('size') is not None:
      child.size = np.asarray(child.size, dtype=float) * size_factor
    if child.tag in ('body', 'worldbody'):
      rescale_subtree(child, position_factor, size_factor)


def rescale_humanoid(walker, position_factor, size_factor=None,
                     mass=None):
  """Rescales a humanoid walker's lengths, sizes, and masses."""
  body = walker.mjcf_model.find('body', 'root')
  subtree_root = body.parent
  if size_factor is None:
    size_factor = position_factor
  rescale_subtree(subtree_root, position_factor, size_factor)

  if mass is not None:
    from dm_control_tpu import mjcf
    physics = mjcf.Physics.from_mjcf_model(walker.mjcf_model)
    current_mass = float(np.asarray(
        physics.bind(walker.root_body).subtreemass))
    mass_factor = mass / current_mass
    for geom in walker.mjcf_model.find_all('geom'):
      if geom.get_attributes().get('mass') is not None:
        geom.mass = float(geom.mass) * mass_factor
      else:
        density = geom.get_attributes().get('density')
        current_density = float(density) if density is not None else 1000.
        geom.density = current_density * mass_factor
