"""Where does rollout time actually go? (realistic-state profiler)

perfprof.py times pipeline stages on a settled, warm-started state where
the Newton solver converges immediately; the benchmark rollout runs on
falling/contact-rich states where it doesn't. This tool reproduces the
bench rollout, then times its pieces on REAL rollout states:
  - one full control step (step_core: n_sub physics steps + obs/reward)
  - one physics step (step_batched) on mid-rollout states
  - the constraint solve alone + its iteration-count distribution
  - the fwd_pv observation refresh + task obs/reward/termination

Usage: python tools/rollout_prof.py [domain:task] [batch] [--cpu]
"""

import os
import sys
import time

if '--cpu' in sys.argv:
  import jax
  jax.config.update('jax_platforms', 'cpu')
  sys.argv.remove('--cpu')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax

from dm_control_tpu import _cache
_cache.configure(jax.config,
                 os.path.join(os.path.dirname(__file__), '..'))

import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args, iters=10, per=1):
  out = jax.block_until_ready(f(*args))   # compile
  t0 = time.perf_counter()
  for _ in range(iters):
    out = f(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / iters / per
  print(f'{name:36s} {dt * 1e3:9.3f} ms')
  return dt


def main():
  spec = sys.argv[1] if len(sys.argv) > 1 else 'humanoid:run'
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
  domain_name, task_name = spec.split(':')

  import importlib
  from dm_control_tpu.ops import forward as fwd
  from dm_control_tpu.ops import constraint
  from dm_control_tpu.parallel import BatchedEnvironment

  domain = importlib.import_module(f'dm_control_tpu.suite.{domain_name}')
  env = domain.SUITE[task_name]()
  m, task = env.model, env.task
  n_sub = env.n_sub_steps
  benv = BatchedEnvironment(m, task, batch_size=batch,
                            n_sub_steps=n_sub, seed=0)
  benv.reset()
  print(f'# {spec} batch={batch} n_sub={n_sub} '
        f'device={jax.devices()[0].platform} nv={m.nv} '
        f'nefc_max={m.nefc_max} iters={m.opt.solver_iterations}')

  # advance to a realistic mid-rollout state distribution
  benv.rollout_random(30)
  state = benv._state
  model = benv.model

  key = jax.random.PRNGKey(1)
  lo = np.where(np.array(model.actuator_ctrllimited, dtype=bool),
                np.asarray(model.actuator_ctrlrange)[:, 0], -1.0)
  hi = np.where(np.array(model.actuator_ctrllimited, dtype=bool),
                np.asarray(model.actuator_ctrlrange)[:, 1], 1.0)
  actions = jax.random.uniform(key, (batch, m.nu), minval=lo, maxval=hi,
                               dtype=jnp.float32)

  step_core = benv._step_core
  f_core = jax.jit(lambda s, a: step_core(model, s, a))
  dt_core = timeit('step_core (full control step)', f_core, state,
                   actions)

  # the n_sub physics steps alone (slim carry scan, no obs)
  def physics_only(s, a):
    D = jax.vmap(lambda d: fwd.inflate(model, d))(
        jax.vmap(lambda d: d)(s)) if False else None
    Dfull = jax.vmap(lambda ss: fwd.inflate(model, ss))(s)
    Dfull = Dfull.replace(ctrl=a)
    s = fwd.slim_state(Dfull)

    def body(si, _):
      Di = fwd.step_batched(model,
                            jax.vmap(lambda x: fwd.inflate(model, x))(si),
                            compute_sensors=False)
      return fwd.slim_state(Di), ()

    s, _ = jax.lax.scan(body, s, None, length=n_sub)
    return s

  f_phys = jax.jit(physics_only)
  dt_phys = timeit(f'physics x{n_sub} (scan, slim carry)', f_phys,
                   state, actions)
  print(f'{"  -> per physics step":36s} {dt_phys / n_sub * 1e3:9.3f} ms')

  # one full-Data forward_batched + constraint on rollout states
  def inflate_b(s):
    return jax.vmap(lambda ss: fwd.inflate(model, ss))(s)

  D = jax.jit(lambda s: jax.vmap(
      lambda d: fwd.fwd_pv(model, fwd.inflate(model, d),
                           compute_sensors=False))(s))(state)
  D = jax.block_until_ready(D.replace(ctrl=actions))

  f_step1 = jax.jit(lambda DD: fwd.step_batched(model, DD,
                                                compute_sensors=False))
  timeit('step_batched (one phys step)', f_step1, D)

  Dpre = jax.jit(lambda DD: jax.vmap(
      lambda d: fwd.fwd_acceleration(
          model, fwd.fwd_actuation(model, d)))(DD))(D)
  Dpre = jax.block_until_ready(Dpre)
  f_con = jax.jit(
      lambda DD: constraint.fwd_constraint_batched(model, DD))
  timeit('fwd_constraint_batched', f_con, Dpre)
  Dc = f_con(Dpre)
  ni = np.asarray(Dc.solver_niter)
  print(f'{"  solver_niter (batch total)":36s} {ni.max():9d}')

  # observation/reward tail
  def obs_tail(s):
    DD = inflate_b(s)
    DD = jax.vmap(lambda d: fwd.fwd_pv(model, d))(DD)
    DD = jax.vmap(lambda d: task.after_step(model, d))(DD)
    obs = jax.vmap(lambda d: task.get_observation(model, d))(DD)
    rew = jax.vmap(lambda d: task.get_reward(model, d))(DD)
    return obs, rew

  timeit('fwd_pv + obs/reward tail', jax.jit(obs_tail), state)

  # auto-reset epilogue (fresh init + where-merge) as in _step
  def reset_tail(s, k):
    keys = jax.random.split(k, batch)
    fresh = jax.vmap(lambda kk: benv._init_one(model, kk))(keys)
    fs = fwd.slim_state(fresh)
    done = jnp.zeros(batch, dtype=bool)
    return jax.tree.map(
        lambda new, old: jnp.where(
            done.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
        fs, s)

  timeit('auto-reset epilogue (fresh init)', jax.jit(reset_tail), state,
         key)

  n_steps = 20
  t0 = time.perf_counter()
  _, tot = benv.rollout_random(n_steps)
  jax.block_until_ready(tot)
  dt = (time.perf_counter() - t0) / n_steps
  print(f'{"rollout_random per control step":36s} {dt * 1e3:9.3f} ms')
  print(f'env steps/s: {batch / dt:,.0f}   physics steps/s: '
        f'{batch * n_sub / dt:,.0f}')


if __name__ == '__main__':
  main()
