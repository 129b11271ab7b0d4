"""Device-level op profile of the batched step via jax.profiler + xplane.

Traces warm calls of step_core (the bench hot path) and prints the top
HLO ops by self device time, aggregated by fusion name.

Usage: python tools/traceprof.py [domain:task] [batch] [what]
  what: step (default) | solve | smooth
"""

import glob
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax

from dm_control_tpu import _cache
_cache.configure(jax.config, os.path.join(os.path.dirname(__file__), '..'))

import jax.numpy as jnp
import numpy as np


def main():
  spec = sys.argv[1] if len(sys.argv) > 1 else 'humanoid:run'
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
  what = sys.argv[3] if len(sys.argv) > 3 else 'step'
  domain_name, task_name = spec.split(':')

  import importlib
  from dm_control_tpu.ops import constraint
  from dm_control_tpu.ops import forward as fwd
  from dm_control_tpu.parallel import BatchedEnvironment

  domain = importlib.import_module(f'dm_control_tpu.suite.{domain_name}')
  env = domain.SUITE[task_name]()
  m, task = env.model, env.task
  benv = BatchedEnvironment(m, task, batch_size=batch,
                            n_sub_steps=env.n_sub_steps, seed=0)
  benv.reset()
  benv.rollout_random(30)
  state = benv._state
  model = benv.model

  if what == 'step':
    D = jax.jit(jax.vmap(lambda s: fwd.inflate(model, s)))(state)
    f = jax.jit(lambda DD: fwd.step_batched(model, DD,
                                            compute_sensors=False))
    args = (jax.block_until_ready(D),)
  elif what == 'solve':
    D = jax.jit(jax.vmap(lambda s: fwd.inflate(model, s)))(state)
    D = jax.jit(lambda DD: jax.vmap(
        lambda d: fwd.fwd_acceleration(
            model, fwd.fwd_actuation(
                model, fwd.fwd_pv(model, d, False))))(DD))(D)
    f = jax.jit(lambda DD: constraint.fwd_constraint_batched(model, DD))
    args = (jax.block_until_ready(D),)
  else:
    D = jax.jit(jax.vmap(lambda s: fwd.inflate(model, s)))(state)
    f = jax.jit(lambda DD: jax.vmap(
        lambda d: fwd.fwd_pv(model, d, False))(DD))
    args = (jax.block_until_ready(D),)

  jax.block_until_ready(f(*args))   # compile

  logdir = '/tmp/jaxtrace'
  os.system(f'rm -rf {logdir}')
  with jax.profiler.trace(logdir):
    for _ in range(5):
      out = f(*args)
    jax.block_until_ready(out)

  # parse the xplane
  paths = glob.glob(f'{logdir}/**/*.xplane.pb', recursive=True)
  assert paths, 'no trace written'
  from tensorflow.tsl.profiler.protobuf import xplane_pb2
  xs = xplane_pb2.XSpace()
  xs.ParseFromString(open(paths[0], 'rb').read())
  for plane in xs.planes:
    if 'TPU' not in plane.name and 'tpu' not in plane.name:
      continue
    ev_meta = {mid: mm.name for mid, mm in plane.event_metadata.items()}
    totals = {}
    for line in plane.lines:
      if 'XLA Ops' not in line.name and 'Steps' not in line.name:
        pass
      for ev in line.events:
        name = ev_meta.get(ev.metadata_id, '?')
        dur = ev.duration_ps / 1e9  # ms
        key = (line.name, name)
        totals[key] = totals.get(key, 0.0) + dur
    by_line = {}
    for (ln, name), v in totals.items():
      by_line.setdefault(ln, []).append((v, name))
    print(f'== plane: {plane.name}')
    for ln, items in by_line.items():
      items.sort(reverse=True)
      tot = sum(v for v, _ in items)
      print(f'-- line: {ln}  total {tot:.3f} ms over 5 iters')
      for v, name in items[:25]:
        print(f'   {v/5:9.4f} ms  {name[:110]}')


if __name__ == '__main__':
  main()
