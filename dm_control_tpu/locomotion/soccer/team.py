"""Teams and players
(reference: dm_control/locomotion/soccer/team.py:17-31)."""

import collections
import enum

RGBA_BLUE = [.1, .1, .8, 1.]
RGBA_RED = [.8, .1, .1, 1.]


class Team(enum.Enum):
  HOME = 0
  AWAY = 1


Player = collections.namedtuple('Player', ['team', 'walker'])
