"""Scripted-input drive of the web viewer: HTTP session end to end.

Starts WebViewer on a free port, runs a short live session in a
thread, and drives it like a browser would: fetch the page, pull raw
frames, post mouse orbit / zoom / pause events, and verify the camera
actually moved (frame changed) and pause took effect.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from dm_control_tpu import suite  # noqa: E402
from dm_control_tpu.viewer import web  # noqa: E402

W, H = 96, 72


def _get(port, path):
  with urllib.request.urlopen(
      f'http://127.0.0.1:{port}{path}', timeout=30) as r:
    return r.read()


def _post(port, ev):
  req = urllib.request.Request(
      f'http://127.0.0.1:{port}/event',
      data=json.dumps(ev).encode(), method='POST')
  with urllib.request.urlopen(req, timeout=30) as r:
    return r.read()


def test_web_viewer_scripted_session():
  viewer = web.WebViewer(width=W, height=H, port=0)
  result = {}

  def run():
    result['frames'] = viewer.launch(
        lambda: suite.load('cartpole', 'balance'),
        max_frames=2000, fps_cap=1000.0)

  t = threading.Thread(target=run, daemon=True)
  t.start()

  # wait for the first rendered frame
  deadline = time.time() + 300
  frame = None
  while time.time() < deadline:
    raw = _get(viewer.port, '/frame.raw')
    if raw and np.frombuffer(raw, np.uint8).std() > 0:
      frame = np.frombuffer(raw, np.uint8).reshape(H, W, 3)
      break
    time.sleep(0.5)
  assert frame is not None, 'no frame served'

  page = _get(viewer.port, '/').decode()
  assert 'canvas' in page and str(W) in page

  status = _get(viewer.port, '/status').decode()
  assert 'Status' in status or len(status) > 0

  # orbit the free camera: press-left, drag, release -> frame changes
  _post(viewer.port, {'type': 'press', 'button': 'left',
                      'cursor': [0.5, 0.5], 'ctrl': False})
  _post(viewer.port, {'type': 'move', 'cursor': [0.8, 0.6]})
  _post(viewer.port, {'type': 'release', 'button': 'left'})
  _post(viewer.port, {'type': 'scroll', 'steps': 2})
  time.sleep(1.0)
  deadline = time.time() + 120
  moved = False
  while time.time() < deadline and not moved:
    raw2 = np.frombuffer(_get(viewer.port, '/frame.raw'),
                         np.uint8).reshape(H, W, 3)
    moved = float(np.abs(raw2.astype(int) - frame.astype(int)).mean()) > 1
    time.sleep(0.5)
  assert moved, 'camera orbit/zoom did not change the rendered frame'

  # pause via the space key binding
  _post(viewer.port, {'type': 'key', 'key': ' ', 'ctrl': False})
  time.sleep(0.2)
  assert viewer.app.paused.value

  viewer.stop()
  t.join(timeout=120)
  assert not t.is_alive()
  assert result.get('frames', 0) > 0
