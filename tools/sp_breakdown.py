#!/usr/bin/env python
"""Wall-clock per-step timing of the production train step at full scale.

Times trainer.train_step(step) in a plain python loop — exactly what
train.py pays per step, including tunnel dispatch — for the init and sp
stage families at synthetic_fullscale.yaml scale, plus a dispatch floor
(no-op jit through the tunnel).

Usage: python tools/sp_breakdown.py [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np


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
    from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
    from sk_gs_tpu.models.losses import LossWeights
    from train import build_model_cfg, build_scene

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    # dispatch floor: tiny jitted fn called per-iteration like a train step
    noop = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    x = noop(x)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(50):
        x = noop(x)
    jax.block_until_ready(x)
    print(f"{'dispatch floor (no-op jit)':38s} {(time.time()-t0)/50*1e3:9.2f} ms",
          flush=True)

    cfg = make_config('configs/synthetic_fullscale.yaml', [])
    scene, meta, _eval, _ = build_scene(cfg)
    skcfg, rcfg = build_model_cfg(cfg, meta, scene.image_size)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.3, 1.3, size=(2000, 3)).astype(np.float32)
    cols = rng.uniform(size=(2000, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, skcfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), skcfg, base,
                             np.asarray(meta.train_times))
    tr = SKGSTrainer(skcfg, rcfg, scene, meta, model,
                     loss_weights=LossWeights(cfg.get('loss', {})),
                     pcd=(pts, cols))

    def time_family(name, step0):
        # warmup (compile + interval programs)
        for s in range(step0, step0 + 3):
            m = tr.train_step(s)
        jax.block_until_ready(m['loss'])
        t0 = time.time()
        for s in range(step0 + 3, step0 + 3 + R):
            m = tr.train_step(s)
        jax.block_until_ready(m['loss'])
        print(f"{name:38s} {(time.time()-t0)/R*1e3:9.1f} ms/step", flush=True)

    # step numbers chosen inside each stage family, avoiding the interval
    # boundaries (densify %100, sp_adjust) as much as a contiguous run can
    time_family('init family (step ~3001)', 3001)
    time_family('sp family (step ~14001)', 14001)


if __name__ == '__main__':
    main()
