"""Interactive exploration of the soccer environment.

Behavioral contract: reference locomotion/soccer/explore.py — launch a
2-vs-2 boxhead soccer match in the viewer. Run:

    python -m dm_control_tpu.locomotion.soccer.explore
"""

from dm_control_tpu import viewer
from dm_control_tpu.locomotion import soccer


def main(team_size=2, time_limit=45.):
  viewer.launch(
      lambda: soccer.load(team_size=team_size, time_limit=time_limit))


if __name__ == '__main__':
  main()
