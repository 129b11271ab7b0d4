"""A soccer ball that tracks which player last hit it
(behavioural counterpart of reference
dm_control/locomotion/soccer/soccer_ball.py:42-262).

The reference detects hits by scanning mjData contacts against player
geom ids; here hits are detected by proximity of registered player
ball-shell geoms to the ball surface each substep — the same
hit/repossessed/intercepted statistics contract.
"""

import numpy as np

from dm_control_tpu.entities import props

# FIFA regulation parameters for a size 5 ball.
_REGULATION_RADIUS = 0.117  # Meters.
_REGULATION_MASS = 0.45  # Kilograms.

_DEFAULT_FRICTION = (0.7, 0.05, 0.04)  # (slide, spin, roll).
_DEFAULT_DAMP_RATIO = 0.4

_TOUCH_MARGIN = 0.05  # proximity margin (m) counting as a touch


def regulation_soccer_ball():
  return SoccerBall(
      radius=_REGULATION_RADIUS,
      mass=_REGULATION_MASS,
      friction=_DEFAULT_FRICTION,
      damp_ratio=_DEFAULT_DAMP_RATIO)


class SoccerBall(props.Primitive):
  """A soccer ball that keeps track of entities that touch it."""

  def _build(self, radius=0.35, mass=0.045,
             friction=(0.7, 0.075, 0.075), damp_ratio=1.0,
             name='soccer_ball'):
    super()._build(geom_type='sphere', size=(radius,), name=name)
    if damp_ratio < 0.0:
      raise ValueError(
          f'Invalid `damp_ratio` parameter ({damp_ratio}).')
    self._radius = radius
    self._geom.set_attributes(
        pos=[0, 0, radius], size=[radius], condim=6, priority=1,
        mass=mass, friction=friction, solref=[0.02, damp_ratio],
        rgba=(0.95, 0.95, 0.95, 1))
    for cam_name, dist in (('ball_cam_near', 2), ('ball_cam', 7),
                           ('ball_cam_far', 10)):
      self._mjcf_root.worldbody.add(
          'camera', name=cam_name, pos=[0, -dist, dist],
          zaxis=[0, -1, 1], fovy=70, mode='trackcom')

    self._players = []
    self.initialize_entity_trackers()

  def register_player(self, player):
    self._players.append(player)

  def initialize_entity_trackers(self):
    self._last_hit = None
    self._hit = False
    self._repossessed = False
    self._intercepted = False
    # tracks distance traveled between consecutive hits
    self._pos_at_last_hit = None
    self._dist_between_last_hits = None

  def initialize_episode(self, physics, random_state):
    del random_state
    # cache each player's touchable geoms for the proximity check
    self._player_geoms = []
    for player in self._players:
      geoms = list(player.walker.ground_contact_geoms) or list(
          player.walker.mjcf_model.find_all('geom'))
      self._player_geoms.append(geoms)
    self.initialize_entity_trackers()

  def after_substep(self, physics, random_state):
    del random_state
    if not self._players:
      return
    center = np.asarray(physics.bind(self._geom).xpos)
    hit_player = None
    best = np.inf
    for player, geoms in zip(self._players, self._player_geoms):
      pts = np.asarray(physics.bind(geoms).xpos).reshape(-1, 3)
      d = float(np.min(np.linalg.norm(pts - center, axis=-1)))
      if d < best:
        best, closest = d, player
    if best < self._radius + _TOUCH_MARGIN:
      hit_player = closest
    if hit_player is not None:
      self._hit = True
      self._repossessed = hit_player is not self._last_hit
      self._intercepted = (
          self._last_hit is not None
          and hit_player.team != self._last_hit.team)
      if self._pos_at_last_hit is not None:
        self._dist_between_last_hits = float(
            np.linalg.norm(center[:2] - self._pos_at_last_hit[:2]))
      self._pos_at_last_hit = center.copy()
      self._last_hit = hit_player

  def before_step(self, physics, random_state):
    del physics, random_state
    # hit/repossessed/intercepted report per-control-step events
    self._hit = False
    self._repossessed = False
    self._intercepted = False

  @property
  def last_hit(self):
    """The player that last came into contact with the ball."""
    return self._last_hit

  @property
  def hit(self):
    """Whether the ball was hit this control step."""
    return self._hit

  @property
  def repossessed(self):
    """Whether a different player touched the ball this step."""
    return self._repossessed

  @property
  def intercepted(self):
    """Whether the opposing team took possession this step."""
    return self._intercepted

  @property
  def dist_between_last_hits(self):
    """2D distance the ball traveled between the last two hits."""
    return self._dist_between_last_hits
