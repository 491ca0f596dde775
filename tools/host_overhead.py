#!/usr/bin/env python
"""Measure per-step HOST overhead of the real trainer loop on TPU.

The round-4 bucketed run logged ~100-108 ms/step wall while a pure device
probe loop of the same jitted step measured ~20 ms (BASELINE.md round 4).
This tool separates where the gap comes from, using the REAL
SKGSTrainer.train_step (not a probe body):

  A. N steps, never blocking (async dispatch, block once at the end)
  B. N steps, blocking on metrics['loss'] each step (dispatch round trip)
  C. host-prep cost alone (sampler + loss weights + sched build, no device)
  D. device_put cost of the per-step sched vector

Usage: python tools/host_overhead.py [config] [n_steps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else \
        'configs/synthetic_fullscale.yaml'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / '.jax_cache'))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from sk_gs_tpu.framework.config import make_config
    from sk_gs_tpu.framework.trainer import SKGSTrainer
    from sk_gs_tpu.models import sk_gs
    from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
    from sk_gs_tpu.models.losses import LossWeights
    from train import build_model_cfg, build_scene

    cfg = make_config(cfg_path, ['train.capacity_buckets=true'])
    scene, meta, eval_scene, _ = build_scene(cfg)
    skcfg, rcfg = build_model_cfg(cfg, meta, scene.image_size)
    rng = np.random.default_rng(0)
    n0 = int(cfg['train'].get('num_init_points', 2000))
    pts = rng.uniform(-1.3, 1.3, size=(n0, 3)).astype(np.float32)
    cols = rng.uniform(size=(n0, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, skcfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), skcfg, base,
                             np.asarray(meta.train_times))
    trainer = SKGSTrainer(skcfg, rcfg, scene, meta, model,
                          loss_weights=LossWeights(cfg.get('loss', {})),
                          eval_scene=eval_scene, pcd=(pts, cols),
                          capacity_buckets=True)

    print(f'platform: {jax.devices()[0].platform}, '
          f'capacity {trainer.state.model.capacity}')

    # warmup + settle the capacity bucket (first check at step 1)
    t0 = time.time()
    for step in range(1, 31):
        m = trainer.train_step(step)
    jax.block_until_ready(m['loss'])
    print(f'warmup 30 steps (incl. compile): {time.time() - t0:.1f} s, '
          f'capacity now {trainer.state.model.capacity}, '
          f'pair cap {trainer.rcfg.pair_capacity}')

    s0 = 31
    # block-every-K sweep (K=0 -> never block): the axon tunnel degrades
    # badly with a deep async queue, so the optimum is a shallow pipeline
    results = {}
    for k in (1, 2, 4, 8, 16, 0):
        t0 = time.time()
        for i, step in enumerate(range(s0, s0 + n)):
            m = trainer.train_step(step)
            if k and (i + 1) % k == 0:
                jax.block_until_ready(m['loss'])
        jax.block_until_ready(m['loss'])
        results[k] = (time.time() - t0) / n * 1e3
        print(f'  block every {k or "never":>5}: {results[k]:8.2f} ms/step',
              flush=True)
        s0 += n
    a, b = results[0], results[1]

    # C: host prep alone (sample + weights + sched floats, no device calls)
    from sk_gs_tpu.framework.trainer import LW_NAMES
    t0 = time.time()
    for step in range(s0, s0 + n):
        trainer.loss_w.set_step(step)
        idx = trainer.sampler.sample(step)
        lw_vals = [trainer.loss_w.w(nm) for nm in LW_NAMES]
        _ = [float(trainer.stage_rel_step(step)), 0.0] + lw_vals \
            + [float(idx)]
    c = (time.time() - t0) / n * 1e3

    # D: device_put of the sched vector
    vec = np.zeros(2 + len(LW_NAMES) + 1, np.float32)
    jax.block_until_ready(jnp.asarray(vec))
    t0 = time.time()
    for _ in range(n):
        x = jnp.asarray(vec + 1.0)
    jax.block_until_ready(x)
    d = (time.time() - t0) / n * 1e3

    # E: dispatch-only round trip of a trivial jitted fn
    f = jax.jit(lambda x: x + 1.0)
    y = jax.block_until_ready(f(jnp.zeros(())))
    t0 = time.time()
    for _ in range(n):
        y = f(y)
    jax.block_until_ready(y)
    e = (time.time() - t0) / n * 1e3

    print(f'A async loop        : {a:8.2f} ms/step')
    print(f'B blocking loop     : {b:8.2f} ms/step')
    print(f'C host prep only    : {c:8.2f} ms/step')
    print(f'D sched device_put  : {d:8.2f} ms/step')
    print(f'E trivial dispatch  : {e:8.2f} ms/step')


if __name__ == '__main__':
    main()
