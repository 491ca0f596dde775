"""Benchmark: render fwd+bwd throughput of the Pallas rasterizer on a
synthetic 20k-Gaussian scene at 400x400 (the driver's headline metric:
fwd+bwd pixels/s/chip; vs_baseline = ratio to the CUDA reference's
~53 Mpix/s on a single GPU, derived from the committed 1000-step timing
block /root/reference/train.py:383-389: fwd 2.87ms + bwd 7.20ms over ~3
renders... conservatively 160k pixels / 3.0 ms fwd+bwd-share ~= 53 Mpix/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    sys.path.insert(0, '/root/repo')
    from sk_gs_tpu.ops import transforms as tf
    from sk_gs_tpu.render import (GaussianInputs, RasterConfig, ViewParams,
                                  composite_background, render)

    on_tpu = jax.devices()[0].platform != 'cpu'
    rng = np.random.default_rng(3)
    n = 20000
    g = GaussianInputs(
        means3d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.7),
        scales=jnp.asarray(np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.4 - 3.8)),
        rotations=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)))
    W = H = 400
    eye = jnp.asarray([0.0, 0.0, -4.0])
    view = ViewParams(
        Tw2v=tf.look_at(eye, jnp.zeros(3), jnp.asarray([0.0, -1.0, 0.0]),
                        coord='opencv'),
        Tv2c=tf.perspective_opencv(jnp.asarray(0.8), size=(W, H)),
        campos=eye,
        tan_fovx=jnp.asarray(np.tan(0.4), jnp.float32),
        tan_fovy=jnp.asarray(np.tan(0.4), jnp.float32))
    cfg = RasterConfig(image_width=W, image_height=H,
                       pair_capacity=2 ** 17, chunk=128, use_pallas=on_tpu)

    def loss_fn(g):
        out = render(g, view, cfg)
        img = composite_background(out['images'], out['opacity'], jnp.ones(3))
        return jnp.mean(jnp.abs(img))

    vg = jax.jit(jax.value_and_grad(loss_fn))
    val, grads = jax.block_until_ready(vg(g))  # compile
    iters = 20 if on_tpu else 3
    t0 = time.time()
    for _ in range(iters):
        val, grads = vg(g)
    jax.block_until_ready(grads)
    dt = (time.time() - t0) / iters
    pixels_per_s = W * H / dt

    baseline = 53e6  # CUDA reference fwd+bwd pixels/s (single GPU, see above)
    print(json.dumps({
        "metric": "render_fwd_bwd_throughput",
        "value": round(pixels_per_s / 1e6, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(pixels_per_s / baseline, 4),
    }))


if __name__ == '__main__':
    main()
