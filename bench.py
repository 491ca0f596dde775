"""Benchmark: render fwd+bwd throughput of the Pallas rasterizer on a
synthetic 20k-Gaussian scene at 400x400 (the driver's headline metric:
fwd+bwd pixels/s/chip; vs_baseline = ratio to the CUDA reference's
~53 Mpix/s on a single GPU, derived from the committed 1000-step timing
block /root/reference/train.py:383-389: fwd 2.87ms + bwd 7.20ms over ~3
renders... conservatively 160k pixels / 3.0 ms fwd+bwd-share ~= 53 Mpix/s).

The frame loop runs INSIDE one jitted lax.scan (a different orbit camera per
frame): this measures steady-state device throughput. Per-call dispatch
through the axon TPU tunnel costs ~9 ms — two orders of magnitude above a
production TPU runtime's dispatch — and would otherwise dominate a
one-render-per-call loop (profiler-verified: 0.92 ms device time vs 10.6 ms
tunnel wall time per render).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def probe_backend(timeout_s: float) -> tuple[bool, str]:
    """Check whether the default jax backend initializes, in a SUBPROCESS.

    The axon TPU tunnel has been observed to HANG backend init for ~25 min
    before failing UNAVAILABLE; an in-process jax.devices() call can't be
    interrupted reliably (the hang is inside a C extension), so we probe in a
    child with a hard timeout. Returns (ok, reason)."""
    try:
        r = subprocess.run(
            [sys.executable, '-c',
             'import jax; d = jax.devices(); print(d[0].platform)'],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f'backend init timed out after {timeout_s:.0f}s'
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return False, (tail[-1][:200] if tail else f'probe rc={r.returncode}')
    return True, r.stdout.strip()


def main():
    # An outage must produce a parseable JSON line, not a traceback
    # (round-2 lesson: BENCH_r02.json was rc=1 because the worker was down).
    probe_timeout = float(os.environ.get('BENCH_TPU_PROBE_S', '900'))
    ok, reason = probe_backend(probe_timeout)
    if not ok:
        print(json.dumps({
            "metric": "render_fwd_bwd_throughput",
            "value": None,
            "unit": "Mpix/s/chip",
            "vs_baseline": None,
            "skipped": True,
            "reason": f"TPU backend unavailable: {reason}",
        }))
        return
    try:
        run_bench()
    except Exception as e:  # worker can drop mid-run; keep the artifact parseable
        print(json.dumps({
            "metric": "render_fwd_bwd_throughput",
            "value": None,
            "unit": "Mpix/s/chip",
            "vs_baseline": None,
            "skipped": True,
            "reason": f"{type(e).__name__}: {str(e)[:200]}",
        }))


def run_bench():
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
    cfg = RasterConfig(image_width=W, image_height=H,
                       pair_capacity=2 ** 17, chunk=128, use_pallas=on_tpu)
    Tv2c = tf.perspective_opencv(jnp.asarray(0.8), size=(W, H))
    tanf = jnp.asarray(np.tan(0.4), jnp.float32)

    def frame(carry, ang):
        eye = 4.0 * jnp.stack([jnp.sin(ang), jnp.zeros(()), -jnp.cos(ang)])
        view = ViewParams(
            Tw2v=tf.look_at(eye, jnp.zeros(3), jnp.asarray([0.0, -1.0, 0.0]),
                            coord='opencv'),
            Tv2c=Tv2c, campos=eye, tan_fovx=tanf, tan_fovy=tanf)

        def loss_fn(g):
            out = render(g, view, cfg)
            img = composite_background(out['images'], out['opacity'],
                                       jnp.ones(3))
            return jnp.mean(jnp.abs(img))

        val, grads = jax.value_and_grad(loss_fn)(g)
        # fold a grad summary into the carry so no frame is dead code
        gsum = sum(jnp.sum(x) for x in jax.tree.leaves(grads))
        return carry + val + 0.0 * gsum, None

    R = 16 if on_tpu else 2

    @jax.jit
    def run(g):
        angs = jnp.linspace(0.0, 2.0 * np.pi, R, endpoint=False)
        total, _ = jax.lax.scan(frame, jnp.zeros(()), angs)
        return total

    jax.block_until_ready(run(g))  # compile
    reps = 4 if on_tpu else 1
    t0 = time.time()
    for _ in range(reps):
        out = run(g)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (reps * R)
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
