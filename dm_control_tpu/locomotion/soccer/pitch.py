"""Soccer pitch arenas: ground, bounding walls, goals, field detector
(behavioural counterpart of reference
dm_control/locomotion/soccer/pitch.py:325-724).

Differences from the reference driven by the TPU engine: bounding walls
are thin boxes rather than infinite planes (the box narrowphase covers
every walker/ball pair), and texture/hoarding decor is omitted — the
analytic ray-caster renders geometry colour, not textures.
"""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.entities import props
from dm_control_tpu.locomotion.soccer import team

_TOP_CAMERA_Y_PADDING_FACTOR = 1.1
_TOP_CAMERA_DISTANCE = 95.
_WALL_HEIGHT = 10.
_WALL_THICKNESS = .5
_SIDE_WIDTH = 32. / 6.
_FIELD_BOX_CONTACT_BIT = 1 << 7

_DEFAULT_PITCH_SIZE = (12, 9)
_DEFAULT_GOAL_LENGTH_RATIO = 0.33  # Goal length / pitch width.

_GOALPOST_RELATIVE_SIZE = 0.07
_SUPPORT_POST_RATIO = 0.75
# Goalposts in the unit box [-1, 1]**3, facing positive X
# (fromto endpoints; the reference's geometry spec).
_GOALPOSTS = {'right_post': (1, -1, -1, 1, -1, 1),
              'left_post': (1, 1, -1, 1, 1, 1),
              'top_post': (1, -1, 1, 1, 1, 1),
              'right_base': (1, -1, -1, -1, -1, -1),
              'left_base': (1, 1, -1, -1, 1, -1),
              'back_base': (-1, -1, -1, -1, 1, -1),
              'right_support': (-1, -1, -1, .2, -1, 1),
              'right_top_support': (.2, -1, 1, 1, -1, 1),
              'left_support': (-1, 1, -1, .2, 1, 1),
              'left_top_support': (.2, 1, 1, 1, 1, 1)}

MINI_FOOTBALL_MAX_AREA_PER_HUMANOID = 350.
MINI_FOOTBALL_MIN_AREA_PER_HUMANOID = 70.
MINI_FOOTBALL_GOAL_SIZE = (1.0, 2.0, 1.0)


def _top_down_cam_fovy(size, top_camera_distance):
  return (360 / np.pi) * np.arctan2(
      _TOP_CAMERA_Y_PADDING_FACTOR * max(size), top_camera_distance)


def _goalpost_radius(size):
  return _GOALPOST_RELATIVE_SIZE * sum(size) / 3.


def _post_radius(name, goalpost_radius):
  radius = goalpost_radius
  if 'top' in name:
    radius *= 1.01        # avoid z-fighting at the corners
  if 'support' in name:
    radius *= _SUPPORT_POST_RATIO
  return radius


def _goalpost_fromto(unit_fromto, size, pos, direction):
  fromto = np.array(unit_fromto, dtype=float) * np.hstack(
      (direction, direction))
  return fromto * np.array(tuple(size) + tuple(size)) + np.array(
      tuple(pos) + tuple(pos))


class Goal(props.PositionDetector):
  """A goal: a latching PositionDetector decorated with goalposts."""

  def _build(self, direction, net_rgba=(1, 1, 1, .15), make_net=False,
             **kwargs):
    if len(kwargs['size']) != 3 or len(kwargs['pos']) != 3:
      raise ValueError('Only 3D Goals are supported.')
    if direction not in (1, -1):
      raise ValueError('direction must be either 1 or -1.')
    del net_rgba, make_net  # net meshes are render decor; not built
    self._direction = np.array((direction, direction, 1))
    kwargs['visible'] = False
    super()._build(retain_substep_detections=True, **kwargs)

    size, pos = kwargs['size'], kwargs['pos']
    self._goalpost_radius = _goalpost_radius(size)
    self._goal_geoms = []
    for geom_name, unit_fromto in _GOALPOSTS.items():
      self._goal_geoms.append(self._mjcf_root.worldbody.add(
          'geom', type='capsule', name=geom_name,
          size=(_post_radius(geom_name, self._goalpost_radius),),
          fromto=_goalpost_fromto(unit_fromto, size, pos,
                                  self._direction),
          rgba=self.goalpost_rgba))

  def resize(self, pos, size):
    super().resize(pos, size)
    self._goalpost_radius = _goalpost_radius(size)
    for geom in self._goal_geoms:
      unit_fromto = _GOALPOSTS[geom.name]
      geom.fromto = _goalpost_fromto(unit_fromto, size, pos,
                                     self._direction)
      geom.size = (_post_radius(geom.name, self._goalpost_radius),)

  @property
  def goalpost_rgba(self):
    rgba = list(self._site.rgba)
    rgba[3] = 1
    return rgba


class Pitch(composer.Arena):
  """A pitch with a ground plane, two goals, walls and a field zone."""

  def _build(self, size=_DEFAULT_PITCH_SIZE, goal_size=None,
             top_camera_distance=_TOP_CAMERA_DISTANCE,
             field_box=False, field_box_offset=0.0,
             hoarding_color_scheme_id=0, name='pitch'):
    super()._build(name=name)
    del hoarding_color_scheme_id  # render decor only
    self._size = tuple(size)
    self._goal_size = goal_size
    self._top_camera_distance = top_camera_distance

    self._top_camera = self._mjcf_root.worldbody.add(
        'camera', name='top_down',
        pos=[0, 0, top_camera_distance], zaxis=[0, 0, 1],
        fovy=_top_down_cam_fovy(self._size, top_camera_distance))

    self._ground_geom = self._mjcf_root.worldbody.add(
        'geom', name='ground', type='plane',
        rgba=(0.306, 0.682, 0.223, 1),
        size=list(self._size) + [max(self._size) / 100.])

    # bounding walls as thin boxes (walkers + ball collide with them)
    self._walls = []
    for axis in (0, 1):
      for sign in (-1, 1):
        pos = [0., 0., _WALL_HEIGHT / 2]
        pos[axis] = sign * (self._size[axis] + _WALL_THICKNESS)
        wall_size = [self._size[0] + 2 * _WALL_THICKNESS,
                     self._size[1] + 2 * _WALL_THICKNESS,
                     _WALL_HEIGHT / 2]
        wall_size[axis] = _WALL_THICKNESS
        self._walls.append(self._mjcf_root.worldbody.add(
            'geom', type='box', rgba=[.1, .1, .1, .8], pos=pos,
            size=wall_size))

    self._fb_offset = field_box_offset if field_box else 0.0
    goal_size = self._get_goal_size()
    self._home_goal = Goal(
        direction=1,
        pos=(-self._size[0] + goal_size[0] + self._fb_offset, 0,
             goal_size[2]),
        size=goal_size, rgba=(.2, .2, 1, 0.5), name='home_goal')
    self.attach(self._home_goal)
    self._away_goal = Goal(
        direction=-1,
        pos=(self._size[0] - goal_size[0] - self._fb_offset, 0,
             goal_size[2]),
        size=goal_size, rgba=(1, .2, .2, 0.5), name='away_goal')
    self.attach(self._away_goal)

    # inverted detector: fires when the ball leaves the field
    self._field = props.PositionDetector(
        pos=(0, 0),
        size=(self._size[0] - 2 * goal_size[0],
              self._size[1] - 2 * goal_size[0]),
        inverted=True, visible=False, name='field')
    self.attach(self._field)

    # field box: collides with the ball only, via a dedicated contact bit
    self._field_box = []
    if field_box:
      half = (np.asarray(self._field.upper)
              - np.asarray(self._field.lower)) / 2.0
      fx, fy = float(half[0]), float(half[1])
      box_h = 20.
      thickness = 1.0
      for axis in (0, 1):
        for sign in (-1, 1):
          pos = [0., 0., box_h]
          pos[axis] = sign * ((fx, fy)[axis] + thickness)
          box_size = [fx, fy, box_h]
          box_size[axis] = thickness
          self._field_box.append(self._mjcf_root.worldbody.add(
              'geom', type='box', rgba=[.3, .3, .3, .0], pos=pos,
              size=box_size))

  def _get_goal_size(self):
    goal_size = self._goal_size
    if goal_size is None:
      goal_size = (_SIDE_WIDTH / 2,
                   self._size[1] * _DEFAULT_GOAL_LENGTH_RATIO,
                   _SIDE_WIDTH / 2)
    return goal_size

  def register_ball(self, ball):
    self._home_goal.register_entities(ball)
    self._away_goal.register_entities(ball)
    if self._field_box:
      ball.geom.contype = int(ball.geom.contype or 1) | (
          _FIELD_BOX_CONTACT_BIT)
      for wall in self._field_box:
        wall.conaffinity = _FIELD_BOX_CONTACT_BIT
        wall.contype = _FIELD_BOX_CONTACT_BIT
    else:
      self._field.register_entities(ball)

  def detected_goal(self):
    """The team that scored, or None."""
    if self._home_goal.detected_entities:
      return team.Team.AWAY
    if self._away_goal.detected_entities:
      return team.Team.HOME
    return None

  def detected_off_court(self):
    return self._field.detected_entities

  @property
  def size(self):
    return self._size

  @property
  def home_goal(self):
    return self._home_goal

  @property
  def away_goal(self):
    return self._away_goal

  @property
  def field(self):
    return self._field

  @property
  def ground_geom(self):
    return self._ground_geom


class RandomizedPitch(Pitch):
  """A pitch that re-randomizes its size each episode."""

  def __init__(self, min_size, max_size, randomizer=None,
               keep_aspect_ratio=False, goal_size=None, field_box=False,
               field_box_offset=0.0,
               top_camera_distance=_TOP_CAMERA_DISTANCE,
               name='randomized_pitch'):
    super().__init__(size=max_size, goal_size=goal_size,
                     field_box=field_box,
                     field_box_offset=field_box_offset,
                     top_camera_distance=top_camera_distance, name=name)
    self._min_size = min_size
    self._max_size = max_size
    self._randomizer = randomizer or (
        lambda rs: rs.uniform(size=(2,)))
    self._keep_aspect_ratio = keep_aspect_ratio

  def initialize_episode_mjcf(self, random_state):
    super().initialize_episode_mjcf(random_state)
    ratio = np.asarray(self._randomizer(random_state), dtype=float)
    if self._keep_aspect_ratio:
      ratio = np.full(2, float(np.min(ratio)))
    size = tuple(np.asarray(self._min_size)
                 + ratio * (np.asarray(self._max_size)
                            - np.asarray(self._min_size)))
    self._resize(size)

  def _resize(self, size):
    self._size = tuple(size)
    self._ground_geom.size = list(size) + [max(size) / 100.]
    for i, wall in enumerate(self._walls):
      axis, sign = divmod(i, 2)
      sign = -1 if sign == 0 else 1
      pos = [0., 0., _WALL_HEIGHT / 2]
      pos[axis] = sign * (size[axis] + _WALL_THICKNESS)
      wall_size = [size[0] + 2 * _WALL_THICKNESS,
                   size[1] + 2 * _WALL_THICKNESS, _WALL_HEIGHT / 2]
      wall_size[axis] = _WALL_THICKNESS
      wall.pos = pos
      wall.size = wall_size
    goal_size = self._get_goal_size()
    self._home_goal.resize(
        pos=(-size[0] + goal_size[0] + self._fb_offset, 0, goal_size[2]),
        size=goal_size)
    self._away_goal.resize(
        pos=(size[0] - goal_size[0] - self._fb_offset, 0, goal_size[2]),
        size=goal_size)
    self._field.resize(pos=(0, 0),
                       size=(size[0] - 2 * goal_size[0],
                             size[1] - 2 * goal_size[0]))
