"""Built-in web viewer: a live, mouse-drivable session in the browser.

The reference delivers interactivity through a GLFW window
(reference dm_control/viewer/gui/glfw_gui.py:40-164, render loop at
viewer/application.py:305-333). A TPU host is headless, so this
front-end serves the same Application over HTTP instead: a canvas page
streams frames (raw RGB — no image codec dependency) and forwards
mouse/keyboard events to the exact controllers the headless
Application already drives (FreeCameraController orbit/pan/zoom,
CameraSelector, Ctrl+drag body perturbation, pause/step/speed keys).

    from dm_control_tpu import suite, viewer
    viewer.launch_web(lambda: suite.load('cartpole', 'swingup'),
                      policy=my_policy, port=8000)

then open http://localhost:8000/.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from dm_control_tpu.viewer import application as app_module
from dm_control_tpu.viewer import runtime as runtime_module
from dm_control_tpu.viewer import user_input

_KEYMAP = {
    ' ': user_input.KEY_SPACE,
    'Backspace': user_input.KEY_BACKSPACE,
    'ArrowRight': user_input.KEY_RIGHT,
    '=': user_input.KEY_EQUAL,
    '-': user_input.KEY_MINUS,
    'Tab': user_input.KEY_TAB,
    'F1': user_input.KEY_F1,
}

_PAGE = """<!DOCTYPE html>
<html><head><title>dm_control_tpu viewer</title><style>
body { background:#111; color:#ddd; font-family:monospace; margin:12px }
canvas { border:1px solid #444; image-rendering:pixelated; cursor:crosshair }
#status { margin-top:6px; white-space:pre }
</style></head><body>
<div>dm_control_tpu viewer — drag: orbit &middot; right-drag: pan &middot;
wheel: zoom &middot; ctrl+drag: perturb body &middot; space: pause &middot;
&rarr;: step &middot; backspace: restart &middot; tab: camera &middot;
-/=: speed</div>
<canvas id="c" width="__W__" height="__H__" tabindex="1"></canvas>
<div id="status"></div>
<script>
const c = document.getElementById('c'), ctx = c.getContext('2d');
const status = document.getElementById('status');
let imgdata = ctx.createImageData(__W__, __H__);
function post(ev) {
  fetch('/event', {method: 'POST', body: JSON.stringify(ev)});
}
function cursor(e) {
  const r = c.getBoundingClientRect();
  return [(e.clientX - r.left) / r.width,
          1.0 - (e.clientY - r.top) / r.height];
}
c.addEventListener('mousedown', e => {
  e.preventDefault(); c.focus();
  const b = ['left','middle','right'][e.button] || 'left';
  post({type:'press', button:b, cursor:cursor(e), ctrl:e.ctrlKey});
});
c.addEventListener('mousemove', e => {
  if (e.buttons) post({type:'move', cursor:cursor(e)});
});
c.addEventListener('mouseup', e => {
  const b = ['left','middle','right'][e.button] || 'left';
  post({type:'release', button:b});
});
c.addEventListener('wheel', e => {
  e.preventDefault();
  post({type:'scroll', steps: e.deltaY > 0 ? -1 : 1});
});
c.addEventListener('contextmenu', e => e.preventDefault());
window.addEventListener('keydown', e => {
  post({type:'key', key:e.key, ctrl:e.ctrlKey});
  if (e.key === ' ' || e.key === 'Tab') e.preventDefault();
});
async function pump() {
  try {
    const resp = await fetch('/frame.raw');
    const buf = new Uint8Array(await resp.arrayBuffer());
    const rgba = imgdata.data;
    for (let i = 0, j = 0; i < buf.length; i += 3, j += 4) {
      rgba[j] = buf[i]; rgba[j+1] = buf[i+1]; rgba[j+2] = buf[i+2];
      rgba[j+3] = 255;
    }
    ctx.putImageData(imgdata, 0, 0);
    const st = await (await fetch('/status')).text();
    status.textContent = st;
  } catch (err) { status.textContent = 'disconnected'; }
  setTimeout(pump, 40);
}
pump();
</script></body></html>
"""


class WebViewer:
  """Serves an Application over HTTP and runs its playback loop."""

  def __init__(self, width=640, height=480, port=0):
    self.app = app_module.Application(width=width, height=height,
                                      frame_callback=self._on_frame)
    self._width, self._height = width, height
    self._status_model = app_module.Status(self.app)
    self._frame_lock = threading.Lock()
    self._frame = np.zeros((height, width, 3), np.uint8)
    self._stop = threading.Event()
    self._server = ThreadingHTTPServer(('127.0.0.1', port),
                                       self._make_handler())
    self.port = self._server.server_address[1]
    self._server_thread = threading.Thread(
        target=self._server.serve_forever, daemon=True)

  # -- frame plumbing --------------------------------------------------

  def _on_frame(self, pixels, overlays):
    del overlays
    with self._frame_lock:
      self._frame = np.asarray(pixels, np.uint8)

  def _status_text(self):
    rows = []
    try:
      for label, value in self._status_model.get_columns():
        rows.append(f'{label:12s} {value}')
    except Exception:                                # pragma: no cover
      pass
    return '\n'.join(rows)

  # -- event dispatch (server thread -> app, guarded by GIL-simple ops)

  def _handle_event(self, ev):
    etype = ev.get('type')
    if etype == 'press':
      mods = user_input.MOD_CONTROL if ev.get('ctrl') else 0
      self.app.handle_mouse_press(ev.get('button', 'left'),
                                  tuple(ev.get('cursor', (0.5, 0.5))),
                                  modifiers=mods)
    elif etype == 'move':
      self.app.handle_mouse_move(tuple(ev.get('cursor', (0.5, 0.5))))
    elif etype == 'release':
      self.app.handle_mouse_release(ev.get('button', 'left'))
    elif etype == 'scroll':
      self.app.handle_scroll(int(ev.get('steps', 0)))
    elif etype == 'key':
      key = _KEYMAP.get(ev.get('key', ''))
      if key is not None:
        self.app.handle_key(key)

  def _make_handler(self):
    viewer = self

    class Handler(BaseHTTPRequestHandler):

      def log_message(self, *args):                # quiet
        del args

      def _send(self, code, ctype, body):
        self.send_response(code)
        self.send_header('Content-Type', ctype)
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

      def do_GET(self):
        if self.path == '/' or self.path.startswith('/index'):
          page = _PAGE.replace('__W__', str(viewer._width)).replace(
              '__H__', str(viewer._height))
          self._send(200, 'text/html', page.encode())
        elif self.path == '/frame.raw':
          with viewer._frame_lock:
            body = viewer._frame.tobytes()
          self._send(200, 'application/octet-stream', body)
        elif self.path == '/status':
          self._send(200, 'text/plain',
                     viewer._status_text().encode())
        else:
          self._send(404, 'text/plain', b'not found')

      def do_POST(self):
        if self.path == '/event':
          n = int(self.headers.get('Content-Length', '0'))
          try:
            ev = json.loads(self.rfile.read(n) or b'{}')
            viewer._handle_event(ev)
            self._send(200, 'text/plain', b'ok')
          except Exception as e:                   # pragma: no cover
            self._send(400, 'text/plain', str(e).encode())
        else:
          self._send(404, 'text/plain', b'not found')

    return Handler

  # -- lifecycle --------------------------------------------------------

  def stop(self):
    self._stop.set()

  def close(self):
    self._stop.set()
    self._server.shutdown()
    self._server.server_close()

  def launch(self, environment_loader, policy=None, max_frames=None,
             fps_cap=30.0):
    """Run the live session until the runtime stops or stop() is called.

    Matches the reference loop semantics (tick -> render -> pump
    events; reference viewer/application.py:305-333) with the event
    pump living on the HTTP server thread.
    """
    self._server_thread.start()
    app = self.app
    if callable(environment_loader):
      app._environment_loader = environment_loader
    else:
      app._environment_loader = lambda: environment_loader
    app._policy = policy
    app._load_environment()
    frames = 0
    min_dt = 1.0 / fps_cap
    try:
      while not self._stop.is_set():
        t0 = time.monotonic()
        app._tick()
        frames += 1
        if max_frames is not None and frames >= max_frames:
          break
        if app.runtime.state == runtime_module.State.STOPPED:
          break
        dt = time.monotonic() - t0
        if dt < min_dt:
          time.sleep(min_dt - dt)
    finally:
      self.close()
    return frames


def launch_web(environment_loader, policy=None, width=640, height=480,
               port=8000, max_frames=None):
  """Launch the browser-based interactive viewer (blocks).

  Prints the URL; open it in a browser on the same host (or tunnel the
  port). Returns the number of frames served.
  """
  viewer = WebViewer(width=width, height=height, port=port)
  print(f'dm_control_tpu viewer: http://127.0.0.1:{viewer.port}/')
  return viewer.launch(environment_loader, policy=policy,
                       max_frames=max_frames)
