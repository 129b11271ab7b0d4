"""Routines that adapt a walker entity to match mocap clip metadata.

Behavioral contract: reference locomotion/mocap/walkers.py WalkerInfo
— compatibility check, per-subtree rescaling, total-mass retargeting,
and marker-site attachment — operating on the plain `walker_info`
dicts produced by `loader.py` instead of protos.
"""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu import mjcf
from dm_control_tpu.locomotion.walkers import rescale

WALKER_MODEL_NAMES = {
    0: 'UNSPECIFIED',
    1: 'CMU_2019',
    4: 'CMU_2020',
}


def _scale_total_mass(walker, target_mass):
  """Multiplies every body's mass (or geom density) so the walker's
  subtree mass lands on `target_mass`."""
  physics = mjcf.Physics.from_mjcf_model(walker.mjcf_model.root_model)
  factor = target_mass / float(
      physics.bind(walker.root_body).subtreemass)
  for body in walker.root_body.find_all('body'):
    inertial = getattr(body, 'inertial', None)
    if inertial is not None and inertial.mass is not None:
      inertial.mass = float(inertial.mass) * factor
  for geom in walker.root_body.find_all('geom'):
    if geom.mass is not None:
      geom.mass = float(geom.mass) * factor
    else:
      geom.density = float(
          geom.density if geom.density is not None else 1000.) * factor


class WalkerInfo:
  """Encapsulates routines that modify a walker to match mocap data."""

  def __init__(self, info):
    """`info` is a walker metadata dict from a mocap loader."""
    self._info = dict(info)

  def check_walker_is_compatible(self, walker):
    model = int(self._info.get('model', 0))
    expected = getattr(walker, 'mocap_walker_model', None)
    if expected is not None and model and expected != model:
      raise ValueError(
          'Walker is not compatible with model type '
          f'{WALKER_MODEL_NAMES.get(model, model)!r}: got {walker}')

  def rescale_walker(self, walker):
    """Rescales subtrees of `walker` per the clip's scaling metadata."""
    self.check_walker_is_compatible(walker)
    for entry in self._info.get('scaling', ()):
      body = walker.mjcf_model.find('body', entry['body_name'])
      if body is None:
        raise ValueError(
            f"walker has no body named {entry['body_name']!r}")
      parent_length = entry.get('parent_length', 0.0)
      position_factor = (parent_length / np.linalg.norm(body.pos)
                         if parent_length else entry['size_factor'])
      rescale.rescale_subtree(body.parent, position_factor,
                              entry['size_factor'])
    if self._info.get('mass', 0.0):
      _scale_total_mass(walker, self._info['mass'])

  def add_marker_sites(self, walker, size=0.01, rgba=(0., 0., 1., .3),
                       default_to_random_position=True,
                       random_state=None):
    """Adds sites corresponding to mocap tracking markers."""
    self.check_walker_is_compatible(walker)
    random_state = random_state or np.random
    markers = self._info.get('markers', ())
    if not markers:
      walker.list_of_site_names = []
      return []
    dclass = walker.mjcf_model.default.add('default', dclass='mocap')
    dclass.site.set_attributes(type='sphere', size=(size,), rgba=rgba,
                               group=composer.SENSOR_SITES_GROUP)
    sites = []
    for marker in markers:
      body = walker.mjcf_model.find('body', marker['parent'])
      if body is None:
        raise ValueError('Walker model does not contain a body named '
                         f"{marker['parent']!r}")
      pos = np.asarray(marker.get('position', ()))
      if pos.size == 0:
        pos = (random_state.uniform(-0.005, 0.005, size=3)
               if default_to_random_position else np.zeros(3))
      sites.append(body.add('site', name=str(marker['name']), pos=pos,
                            dclass=dclass))
    walker.list_of_site_names = [site.name for site in sites]
    return sites
