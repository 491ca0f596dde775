#!/usr/bin/env python
"""Train-step phase breakdown at full scale on the real TPU.

Times, inside jitted scans (steady state, tunnel dispatch amortized):
  A. render-only fwd+bwd (the kernel_lab/bench regime)
  B. deform (init-stage net) fwd+bwd alone
  C. the full trainer step with cnet disabled
  D. the full trainer step as shipped
at the synthetic_fullscale.yaml scale (cap 100352, K=2^20, 400²).

Usage: python tools/step_breakdown.py [steps_per_timing]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np


def timed(name, fn, *args, reps=3):
    import jax
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:38s} {dt*1e3:9.1f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / '.jax_cache'))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import logging
    logging.basicConfig(level=logging.WARNING)

    from sk_gs_tpu.framework.config import make_config
    from sk_gs_tpu.framework.trainer import SKGSTrainer
    from sk_gs_tpu.models import sk_gs
    from sk_gs_tpu.models.deform import deform_net_apply
    from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
    from sk_gs_tpu.models.losses import LossWeights
    from train import build_model_cfg, build_scene

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    cfg = make_config('configs/synthetic_fullscale.yaml', [])
    scene, meta, _eval, _ = build_scene(cfg)
    skcfg, rcfg = build_model_cfg(cfg, meta, scene.image_size)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.3, 1.3, size=(2000, 3)).astype(np.float32)
    cols = rng.uniform(size=(2000, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, skcfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), skcfg, base,
                             np.asarray(meta.train_times))

    def scan(fn):
        @jax.jit
        def run(*args):
            def body(c, _):
                return c + fn(*args), None
            tot, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(R))
            return tot
        return run

    # B: deform net fwd+bwd on all capacity points
    xyz = model.params['xyz']
    net_params = model.params['sp_deform']

    def deform_loss(p, x):
        return jnp.sum(deform_net_apply(p, skcfg.net, x, jnp.asarray(0.5))
                       ['d_xyz'] ** 2)

    def deform_fb(p, x):
        val, g = jax.value_and_grad(deform_loss)(p, x)
        return val + 0.0 * sum(jnp.sum(v) for v in jax.tree.leaves(g))

    timed('deform net fwd+bwd (cap points)', scan(deform_fb), net_params, xyz)

    # C/D: full trainer step, cnet off vs on
    def step_timing(name, use_cnet):
        cfg_v = skcfg._replace(use_canonical_net=use_cnet)
        tr = SKGSTrainer(cfg_v, rcfg, scene, meta, model,
                         loss_weights=LossWeights(cfg.get('loss', {})),
                         pcd=(pts, cols))
        for s in range(1, 3):
            m = tr.train_step(s)
        jax.block_until_ready(m['loss'])
        t0 = time.time()
        for s in range(3, 3 + 4 * R):
            m = tr.train_step(s)
        jax.block_until_ready(m['loss'])
        print(f"{name:38s} {(time.time()-t0)/(4*R)*1e3:9.1f} ms", flush=True)

    step_timing('full step (cnet OFF)', False)
    step_timing('full step (cnet ON, shipped)', True)


if __name__ == '__main__':
    main()
