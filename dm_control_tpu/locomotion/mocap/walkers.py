"""Routines that adapt a walker entity to match mocap clip metadata.

Behavioural counterpart of the reference's `WalkerInfo` (reference:
dm_control/locomotion/mocap/walkers.py:24-97), operating on the plain
`walker_info` dicts produced by `loader.py` instead of protos.
"""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.locomotion.walkers import rescale

WALKER_MODEL_NAMES = {
    0: 'UNSPECIFIED',
    1: 'CMU_2019',
    4: 'CMU_2020',
}


class WalkerInfo:
  """Encapsulates routines that modify a walker to match mocap data."""

  def __init__(self, info):
    """`info` is a walker metadata dict from a mocap loader."""
    self._info = dict(info)

  def check_walker_is_compatible(self, walker):
    model = int(self._info.get('model', 0))
    walker_model = getattr(walker, 'mocap_walker_model', None)
    if walker_model is not None and model and walker_model != model:
      raise ValueError(
          'Walker is not compatible with model type {!r}: got {}'.format(
              WALKER_MODEL_NAMES.get(model, model), walker))

  def rescale_walker(self, walker):
    """Rescales subtrees of `walker` per the clip's scaling metadata."""
    self.check_walker_is_compatible(walker)
    for subtree_info in self._info.get('scaling', ()):
      body = walker.mjcf_model.find('body', subtree_info['body_name'])
      if body is None:
        raise ValueError('walker has no body named {!r}'
                         .format(subtree_info['body_name']))
      subtree_root = body.parent
      parent_length = subtree_info.get('parent_length', 0.0)
      if parent_length:
        position_factor = parent_length / np.linalg.norm(body.pos)
      else:
        position_factor = subtree_info['size_factor']
      rescale.rescale_subtree(
          subtree_root, position_factor, subtree_info['size_factor'])

    target_mass = self._info.get('mass', 0.0)
    if target_mass:
      from dm_control_tpu import mjcf
      physics = mjcf.Physics.from_mjcf_model(walker.mjcf_model.root_model)
      current_mass = float(physics.bind(walker.root_body).subtreemass)
      mass_factor = target_mass / current_mass
      for body in walker.root_body.find_all('body'):
        inertial = getattr(body, 'inertial', None)
        if inertial is not None and inertial.mass is not None:
          inertial.mass = float(inertial.mass) * mass_factor
      for geom in walker.root_body.find_all('geom'):
        if geom.mass is not None:
          geom.mass = float(geom.mass) * mass_factor
        else:
          density = geom.density if geom.density is not None else 1000.
          geom.density = float(density) * mass_factor

  def add_marker_sites(self, walker, size=0.01, rgba=(0., 0., 1., .3),
                       default_to_random_position=True, random_state=None):
    """Adds sites corresponding to mocap tracking markers."""
    self.check_walker_is_compatible(walker)
    random_state = random_state or np.random
    markers = self._info.get('markers', ())
    sites = []
    mocap_class = None
    if markers:
      mocap_class = walker.mjcf_model.default.add('default', dclass='mocap')
      mocap_class.site.set_attributes(
          type='sphere', size=(size,), rgba=rgba,
          group=composer.SENSOR_SITES_GROUP)
    for marker_info in markers:
      body = walker.mjcf_model.find('body', marker_info['parent'])
      if body is None:
        raise ValueError('Walker model does not contain a body named {!r}'
                         .format(marker_info['parent']))
      pos = np.asarray(marker_info.get('position', ()))
      if pos.size == 0:
        if default_to_random_position:
          pos = random_state.uniform(-0.005, 0.005, size=3)
        else:
          pos = np.zeros(3)
      sites.append(body.add('site', name=str(marker_info['name']), pos=pos,
                            dclass=mocap_class))
    walker.list_of_site_names = [site.name for site in sites]
    return sites
