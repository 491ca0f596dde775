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
    if '--mesh' in sys.argv:
        # VERDICT r2 #4: measured multi-chip numbers instead of estimates.
        #   --mesh gs:N    time exchange-render fwd+bwd on an N-device
        #                  ('view'=1, 'gs'=N) mesh vs the plain renderer
        #                  (on 1 real chip this isolates the exchange
        #                  machinery's overhead: band restriction,
        #                  compaction, the all-to-all itself)
        #   --mesh cpu8    weak-scaling proxy on a virtual 8-CPU mesh:
        #                  8 views on ('view'=8) vs 1 view on 1 device
        arg = sys.argv[sys.argv.index('--mesh') + 1]
        run_mesh_bench(arg)
        return
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


def _bench_scene(n, sh_degree=2, seed=3):
    """Shared synthetic scene (SH colors so the exchange path, whose shard
    spec routes `sh`, benches the same workload as the plain renderer)."""
    import jax.numpy as jnp
    from sk_gs_tpu.render import GaussianInputs
    rng = np.random.default_rng(seed)
    n_sh = (sh_degree + 1) ** 2
    return GaussianInputs(
        means3d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.7),
        scales=jnp.asarray(np.exp(
            rng.normal(size=(n, 3)).astype(np.float32) * 0.4 - 3.8)),
        rotations=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacities=jnp.asarray(
            rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)),
        sh=jnp.asarray(
            rng.normal(size=(n, n_sh, 3)).astype(np.float32) * 0.2),
        mask=jnp.ones((n,), bool))


def _orbit_view(ang, W, H):
    import jax.numpy as jnp
    from sk_gs_tpu.ops import transforms as tf
    from sk_gs_tpu.render import ViewParams
    eye = 4.0 * jnp.stack([jnp.sin(ang), jnp.zeros(()), -jnp.cos(ang)])
    tanf = jnp.asarray(np.tan(0.4), jnp.float32)
    return ViewParams(
        Tw2v=tf.look_at(eye, jnp.zeros(3), jnp.asarray([0.0, -1.0, 0.0]),
                        coord='opencv'),
        Tv2c=tf.perspective_opencv(jnp.asarray(0.8), size=(W, H)),
        campos=eye, tan_fovx=tanf, tan_fovy=tanf)


def run_mesh_bench(arg):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    if arg == 'cpu8':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    sys.path.insert(0, '/root/repo')
    from jax.sharding import Mesh
    from sk_gs_tpu.render import (RasterConfig, composite_background, render)
    from sk_gs_tpu.parallel.sharded_render import make_exchange_render

    on_tpu = jax.devices()[0].platform != 'cpu'
    W = H = 400 if on_tpu else 128
    n = 20000 if on_tpu else 4096
    cfg = RasterConfig(image_width=W, image_height=H, sh_degree=2,
                       pair_capacity=2 ** 17 if on_tpu else 2 ** 14,
                       chunk=128, use_pallas=on_tpu)
    g = _bench_scene(n)
    R = 16 if on_tpu else 4

    def timed(run_fn, args):
        jax.block_until_ready(run_fn(*args))
        reps = 4 if on_tpu else 2
        t0 = time.time()
        for _ in range(reps):
            out = run_fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / (reps * R)

    def make_loop(render_fn):
        def frame(carry, ang):
            view = _orbit_view(ang, W, H)

            def loss_fn(gf):
                out = render_fn(g._replace(**gf), view)
                img = composite_background(out['images'], out['opacity'],
                                           jnp.ones(3))
                return jnp.mean(jnp.abs(img))

            gf = dict(means3d=g.means3d, scales=g.scales,
                      rotations=g.rotations, opacities=g.opacities, sh=g.sh)
            val, grads = jax.value_and_grad(loss_fn)(gf)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(grads))
            return carry + val + 0.0 * gsum, None

        @jax.jit
        def run(g):
            angs = jnp.linspace(0.0, 2.0 * np.pi, R, endpoint=False)
            total, _ = jax.lax.scan(frame, jnp.zeros(()), angs)
            return total
        return run

    if arg == 'cpu8':
        # weak-scaling proxy: D views in parallel on a ('view'=D) mesh vs
        # 1 view on 1 device; ideal ratio (per-view time) = 1.0
        from sk_gs_tpu.parallel.mesh import shard_map_compat
        from jax.sharding import PartitionSpec as P
        D = min(8, jax.device_count())
        t1 = timed(make_loop(lambda g, v: render(g, v, cfg)), (g,))

        mesh = Mesh(np.asarray(jax.devices()[:D]), ('view',))

        def one_view(g, angs):
            def frame(carry, ang):
                view = _orbit_view(ang[0], W, H)

                def loss_fn(gf):
                    out = render(g._replace(**gf), view, cfg)
                    img = composite_background(out['images'], out['opacity'],
                                               jnp.ones(3))
                    return jnp.mean(jnp.abs(img))

                gf = dict(means3d=g.means3d, scales=g.scales,
                          rotations=g.rotations, opacities=g.opacities,
                          sh=g.sh)
                val, grads = jax.value_and_grad(loss_fn)(gf)
                # view-DP gradient all-reduce (the real collective cost)
                val = jax.lax.pmean(val, 'view')
                grads = jax.lax.pmean(grads, 'view')
                gsum = sum(jnp.sum(x) for x in jax.tree.leaves(grads))
                return carry + val + 0.0 * gsum, None

            total, _ = jax.lax.scan(frame, jnp.zeros(()), angs)
            return total

        gspec = jax.tree.map(lambda _: P(), g)
        sharded = shard_map_compat(one_view, mesh,
                                   in_specs=(gspec, P('view')),
                                   out_specs=P())

        @jax.jit
        def run_dp(g):
            angs = jnp.linspace(0.0, 2.0 * np.pi, D * R,
                                endpoint=False).reshape(D * R, 1)
            total, = (sharded(g, angs),)
            return total

        jax.block_until_ready(run_dp(g))
        reps = 2
        t0 = time.time()
        for _ in range(reps):
            out = run_dp(g)
        jax.block_until_ready(out)
        tD = (time.time() - t0) / (reps * R)  # D views per scan step
        print(json.dumps({
            "metric": "view_dp_weak_scaling_proxy",
            "value": round(t1 / tD, 4),
            "unit": f"x efficiency at {D} virtual CPU devices "
                    f"({D} views / mesh step vs 1 view / device step; "
                    f"virtual devices contend for the same host cores, "
                    f"so this is a lower bound, not an ICI prediction)",
            "vs_baseline": None,
            "per_view_ms_1dev": round(t1 * 1e3, 3),
            "per_mesh_step_ms": round(tD * 1e3, 3),
        }))
        return

    # gs:N — exchange-render overhead vs the plain renderer, same chip(s)
    n_gs = int(arg.split(':')[1]) if ':' in arg else 1
    assert n_gs <= len(jax.devices()), (
        f"--mesh gs:{n_gs} needs {n_gs} devices, have {len(jax.devices())}")
    t_plain = timed(make_loop(lambda g, v: render(g, v, cfg)), (g,))
    mesh = Mesh(np.asarray(jax.devices()[:n_gs]), ('gs',))
    ex_fn = make_exchange_render(mesh, cfg)
    with mesh:
        t_ex = timed(make_loop(lambda g, v: ex_fn(g, v)), (g,))
    print(json.dumps({
        "metric": "exchange_render_overhead",
        "value": round((t_ex - t_plain) * 1e3, 3),
        "unit": f"ms/frame fwd+bwd at {W}x{H} (gs={n_gs}; plain "
                f"{t_plain * 1e3:.3f} ms, exchange {t_ex * 1e3:.3f} ms)",
        "vs_baseline": round(t_ex / t_plain, 4),
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
    tile_h = int(os.environ.get('BENCH_TILE_H', '16'))
    cap = 2 ** 17 if tile_h == 16 else 2 ** 18  # 16x8 tiles emit ~+33% pairs
    cfg = RasterConfig(image_width=W, image_height=H,
                       pair_capacity=cap, chunk=128, use_pallas=on_tpu,
                       tile_h=tile_h)
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
