"""Per-stage device timing for the forward-dynamics pipeline.

Usage:
  python tools/perfprof.py [domain:task] [batch] [--cpu]

Times each pipeline stage as its own jitted+vmapped function over a
realistic batch, plus the fused whole step, on the bench device (the
real TPU by default). Sum-of-stages > whole-step is expected (per-stage
runs pay full Data HBM round-trips that the fused step elides); the
numbers are for *relative* weight and regression tracking.

This is the TPU equivalent of the reference's step-timer observability
(reference dm_control/suite/wrappers/mujoco_profiling.py:70-107).
"""

import json
import os
import sys
import time

if '--cpu' in sys.argv:
  import jax
  jax.config.update('jax_platforms', 'cpu')
  sys.argv.remove('--cpu')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import jax.numpy as jnp
import numpy as np


def main():
  spec = sys.argv[1] if len(sys.argv) > 1 else 'humanoid:run'
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
  domain_name, task_name = spec.split(':')

  import importlib
  from dm_control_tpu.models import types
  from dm_control_tpu.ops import collision as coll
  from dm_control_tpu.ops import constraint
  from dm_control_tpu.ops import forward as fwd
  from dm_control_tpu.ops import sensor as sensor_ops
  from dm_control_tpu.ops import smooth

  domain = importlib.import_module(f'dm_control_tpu.suite.{domain_name}')
  env = domain.SUITE[task_name]()
  m = env.model

  # batched data in a "stepped" state: random perturbation + one forward
  d0 = types.make_data(m)
  key = jax.random.PRNGKey(0)
  qpos = jnp.tile(jnp.asarray(d0.qpos)[None], (batch, 1))
  qpos = qpos + 0.05 * jax.random.normal(key, qpos.shape, qpos.dtype)
  qvel = 0.2 * jax.random.normal(key, (batch, m.nv), qpos.dtype)
  ctrl = 0.5 * jax.random.normal(key, (batch, m.nu), qpos.dtype)
  d = jax.tree.map(lambda x: jnp.tile(jnp.asarray(x)[None],
                                      (batch,) + (1,) * np.ndim(x)), d0)
  d = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
  vfwd = jax.jit(jax.vmap(lambda dd: fwd.forward(m, dd)))
  d = jax.block_until_ready(vfwd(d))

  def timeit(name, fn, arg, iters=20):
    f = jax.jit(jax.vmap(fn))
    out = jax.block_until_ready(f(arg))   # compile
    t0 = time.perf_counter()
    for _ in range(iters):
      out = f(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:28s} {dt * 1e3:9.3f} ms  '
          f'({dt / batch * 1e9:8.1f} ns/env)')
    return dt

  print(f'# {spec} batch={batch} device={jax.devices()[0].platform} '
        f'nv={m.nv} ncon_max={m.ncon_max} nefc_max={m.nefc_max} '
        f'iters={m.opt.solver_iterations}')

  stages = [
      ('kinematics', lambda dd: smooth.kinematics(m, dd)),
      ('com_pos', lambda dd: smooth.com_pos(m, dd)),
      ('tendon', lambda dd: smooth.tendon(m, dd)),
      ('crb', lambda dd: smooth.crb(m, dd)),
      ('factor_m', lambda dd: smooth.factor_m(m, dd)),
      ('collision', lambda dd: coll.collision(m, dd)),
      ('transmission', lambda dd: smooth.transmission(m, dd)),
      ('com_vel', lambda dd: smooth.com_vel(m, dd)),
      ('rne', lambda dd: smooth.rne(m, dd)),
      ('passive', lambda dd: smooth.passive(m, dd)),
      ('fwd_actuation', lambda dd: fwd.fwd_actuation(m, dd)),
      ('fwd_acceleration', lambda dd: fwd.fwd_acceleration(m, dd)),
      ('fwd_constraint', lambda dd: constraint.fwd_constraint(m, dd)),
      ('sensors_pv', lambda dd: sensor_ops.sensors(m, dd, stages='pv')),
      ('sensors_acc', lambda dd: sensor_ops.sensors(m, dd, stages='acc')),
      ('euler', lambda dd: fwd._euler(m, dd)),
  ]
  total = 0.0
  for name, fn in stages:
    total += timeit(name, fn, d)
  print(f'{"sum of stages":28s} {total * 1e3:9.3f} ms')
  timeit('step (fused)', lambda dd: fwd.step(m, dd), d)
  timeit('step_legacy (fused)', lambda dd: fwd.step_legacy(m, dd), d)

  def timeit_b(name, fn, arg, iters=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(arg))
    t0 = time.perf_counter()
    for _ in range(iters):
      out = f(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:28s} {dt * 1e3:9.3f} ms  '
          f'({dt / batch * 1e9:8.1f} ns/env)')
    return dt

  timeit_b('fwd_constraint_batched',
           lambda dd: constraint.fwd_constraint_batched(m, dd), d)
  timeit_b('euler_batched', lambda dd: fwd._euler_batched(m, dd), d)
  timeit_b('step_batched', lambda dd: fwd.step_batched(m, dd), d)


if __name__ == '__main__':
  main()
