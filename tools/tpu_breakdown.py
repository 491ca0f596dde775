#!/usr/bin/env python
"""Time the renderer's phases separately on the real TPU: preprocess,
binning, fwd blend, fwd+bwd. Guides optimization (which phase dominates)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / '.jax_cache'))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from sk_gs_tpu.render import RasterConfig, render, composite_background
    from sk_gs_tpu.render.settings import GaussianInputs, ViewParams
    from sk_gs_tpu.render.preprocess import preprocess
    from sk_gs_tpu.render.binning import build_tile_lists
    import sk_gs_tpu.ops.transforms as tf

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    rng = np.random.default_rng(0)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g = GaussianInputs(
        means3d=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
        scales=jnp.asarray(np.exp(rng.uniform(-5.0, -3.0, (n, 3))).astype(np.float32)),
        rotations=jnp.asarray(q),
        opacities=jnp.asarray(rng.uniform(0.2, 0.95, (n,)).astype(np.float32)),
        sh=jnp.asarray(rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32)),
        mask=jnp.ones(n, bool))
    fov = 0.9
    Tv2w = np.eye(4, dtype=np.float32); Tv2w[2, 3] = -4.0
    Tv2c = np.asarray(tf.perspective_opencv(jnp.asarray(fov), size=(size, size), n=0.2, f=50.0))
    view = ViewParams(Tw2v=jnp.asarray(np.linalg.inv(Tv2w).astype(np.float32)),
                      Tv2c=jnp.asarray(Tv2c), campos=jnp.asarray(Tv2w[:3, 3]),
                      tan_fovx=jnp.asarray(np.tan(fov/2), jnp.float32),
                      tan_fovy=jnp.asarray(np.tan(fov/2), jnp.float32))
    cfg = RasterConfig(image_width=size, image_height=size, sh_degree=3,
                       pair_capacity=2 ** 17, chunk=128, use_pallas=True)

    @jax.jit
    def f_pre(g, view):
        return preprocess(g, view, cfg)

    @jax.jit
    def f_bin(g, view):
        pre = preprocess(g, view, cfg)
        b = build_tile_lists(pre, cfg)
        return b.sort_gauss, b.chunk_tile, b.num_pairs

    @jax.jit
    def f_fwd(g, view):
        out = render(g, view, cfg)
        return out['images'], out['opacity']

    @jax.jit
    def f_fwdbwd(g, view):
        def loss(g):
            out = render(g, view, cfg)
            img = composite_background(out['images'], out['opacity'], jnp.ones(3))
            return jnp.sum(img * img)
        l, gr = jax.value_and_grad(lambda m: loss(g._replace(means3d=m)))(g.means3d)
        return l, gr

    def bench(fn, name, reps=20):
        t0 = time.time(); o = fn(g, view); jax.block_until_ready(o)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            o = fn(g, view)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / reps
        print(f"{name:10s} {dt*1e3:8.2f} ms   (compile {compile_s:.0f}s)", flush=True)
        return dt

    print(f"size={size} n={n}", flush=True)
    pre = f_pre(g, view); jax.block_until_ready(pre)
    t_pre = bench(f_pre, 'preprocess')
    t_bin = bench(f_bin, 'pre+bin')
    npairs = int(f_bin(g, view)[2])
    t_fwd = bench(f_fwd, 'fwd')
    t_fb = bench(f_fwdbwd, 'fwd+bwd')
    print(f"pairs={npairs}")
    print(f"binning-only ~{(t_bin-t_pre)*1e3:.2f} ms, blend-fwd ~{(t_fwd-t_bin)*1e3:.2f} ms, "
          f"bwd-extra ~{(t_fb-t_fwd)*1e3:.2f} ms")

if __name__ == '__main__':
    main()
