"""Reliable per-stage device timing of the batched physics step.

Times each pipeline stage as its own jit with EXPLICIT device-array
args, amortizing dispatch with many async calls before one sync.

Usage: python tools/stageprof.py [domain:task] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax

from dm_control_tpu import _cache
_cache.configure(jax.config, os.path.join(os.path.dirname(__file__), '..'))

import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args, iters=30):
  out = jax.block_until_ready(f(*args))   # compile
  t0 = time.perf_counter()
  for _ in range(iters):
    out = f(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / iters
  print(f'{name:44s} {dt * 1e3:9.3f} ms')
  return dt


def main():
  spec = sys.argv[1] if len(sys.argv) > 1 else 'humanoid:run'
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
  domain_name, task_name = spec.split(':')

  import importlib
  from dm_control_tpu.ops import collision as coll
  from dm_control_tpu.ops import constraint
  from dm_control_tpu.ops import forward as fwd
  from dm_control_tpu.ops import sensor as sensor_ops
  from dm_control_tpu.ops import smooth
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
  print(f'# {spec} batch={batch} nv={m.nv} nbody={m.nbody} '
        f'ngeom={m.ngeom} nefc_max={m.nefc_max} ncon={m.ncon_max}')

  def vm(fn):
    return jax.jit(jax.vmap(lambda d: fn(model, d)))

  D = jax.jit(jax.vmap(lambda s: fwd.inflate(model, s)))(state)
  D = jax.block_until_ready(D)

  stages_pos = [
      ('kinematics', smooth.kinematics),
      ('com_pos', smooth.com_pos),
      ('tendon', smooth.tendon),
      ('crb', smooth.crb),
      ('factor_m', smooth.factor_m),
      ('collision', coll.collision),
      ('transmission', smooth.transmission),
      ('com_vel', smooth.com_vel),
      ('tendon_vel', smooth.tendon_vel),
      ('rne', smooth.rne),
      ('passive', smooth.passive),
      ('fwd_actuation', fwd.fwd_actuation),
      ('fwd_acceleration', fwd.fwd_acceleration),
  ]
  total = 0.0
  for name, fn in stages_pos:
    f = vm(fn)
    total += timeit(name, f, D)
    D = jax.block_until_ready(f(D))

  f_con = jax.jit(lambda DD: constraint.fwd_constraint_batched(model, DD))
  total += timeit('fwd_constraint_batched', f_con, D)
  Dc = jax.block_until_ready(f_con(D))

  f_eul = jax.jit(lambda DD: fwd._euler_batched(model, DD))
  total += timeit('euler (incl chol)', f_eul, Dc)

  print(f'{"SUM of stages":44s} {total * 1e3:9.3f} ms')

  f_step = jax.jit(lambda DD: fwd.step_batched(model, DD,
                                               compute_sensors=False))
  timeit('step_batched (fused whole)', f_step, D)

  # constraint pieces with explicit args
  rows = jax.block_until_ready(
      jax.jit(jax.vmap(lambda d: constraint.make_rows(model, d)))(D))
  timeit('  make_rows', jax.jit(jax.vmap(
      lambda d: constraint.make_rows(model, d))), D)
  J = rows.J
  from dm_control_tpu.ops import pallas_kernels
  H = jnp.einsum('bve,bwe->bvw', J, J) + D.qM
  g = D.qacc_smooth
  H, g = jax.block_until_ready((H, g))
  timeit('  chol_solve_batched (explicit)',
         jax.jit(pallas_kernels.chol_solve_batched), H, g)
  x = D.qvel
  timeit('  jmul (explicit args)',
         jax.jit(lambda x, J: jnp.einsum('bv,bve->be', x, J)), x, J)


if __name__ == '__main__':
  main()
