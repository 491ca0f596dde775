#!/usr/bin/env python
"""In-jit phase + micro-op profiler for the renderer on real TPU.

Every measurement runs R iterations INSIDE one jitted ``lax.scan`` (per-call
dispatch through the axon tunnel is ~2-9 ms and would otherwise dominate).
Each scan body carries a data dependency through the carry so no iteration is
dead code. Prints one line per phase: name, ms/iter.

Usage: python tools/tpu_phases.py [size] [n] [reps]
"""
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
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    rng = np.random.default_rng(3)
    g = GaussianInputs(
        means3d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.7),
        scales=jnp.asarray(np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.4 - 3.8)),
        rotations=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)))
    W = H = size
    on_tpu = jax.devices()[0].platform != 'cpu'
    cfg = RasterConfig(image_width=W, image_height=H,
                       pair_capacity=2 ** 17, chunk=128, use_pallas=on_tpu)
    Tv2c = tf.perspective_opencv(jnp.asarray(0.8), size=(W, H))
    tanf = jnp.asarray(np.tan(0.4), jnp.float32)

    def mkview(ang):
        eye = 4.0 * jnp.stack([jnp.sin(ang), jnp.zeros(()), -jnp.cos(ang)])
        return ViewParams(
            Tw2v=tf.look_at(eye, jnp.zeros(3), jnp.asarray([0.0, -1.0, 0.0]),
                            coord='opencv'),
            Tv2c=Tv2c, campos=eye, tan_fovx=tanf, tan_fovy=tanf)

    def scan_bench(name, body, extra=None):
        """body(carry, ang, extra) -> new_carry (scalar f32)."""
        @jax.jit
        def run(g, extra):
            angs = jnp.linspace(0.0, 2.0 * np.pi, R, endpoint=False)
            tot, _ = jax.lax.scan(
                lambda c, a: (body(c, a, extra), None), jnp.zeros(()), angs)
            return tot
        t0 = time.time()
        jax.block_until_ready(run(g, extra))
        compile_s = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = run(g, extra)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / (reps * R)
        print(f"{name:28s} {dt*1e3:8.3f} ms/iter  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    def f32sum(tree):
        return sum(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32
                           else x) for x in jax.tree.leaves(tree))

    # ---- pipeline phases (cumulative) ----
    def body_pre(c, a, _):
        pre = preprocess(g._replace(means3d=g.means3d + 1e-6 * c), mkview(a), cfg)
        return c + 0.0 * f32sum((pre.means2d, pre.depths.sum()))

    def body_bin(c, a, _):
        pre = preprocess(g._replace(means3d=g.means3d + 1e-6 * c), mkview(a), cfg)
        b = build_tile_lists(pre, cfg)
        return c + 0.0 * f32sum((b.sort_gauss, b.chunk_valid, b.num_pairs))

    def body_fwd(c, a, _):
        out = render(g._replace(means3d=g.means3d + 1e-6 * c), mkview(a), cfg)
        return c + 0.0 * f32sum((out['images'], out['opacity']))

    def body_fwdbwd(c, a, _):
        view = mkview(a)

        def loss_fn(gg):
            out = render(gg, view, cfg)
            img = composite_background(out['images'], out['opacity'], jnp.ones(3))
            return jnp.mean(jnp.abs(img))
        val, grads = jax.value_and_grad(loss_fn)(
            g._replace(means3d=g.means3d + 1e-6 * c))
        return c + val + 0.0 * f32sum(grads)

    print(f"== pipeline phases (size={size} n={n} R={R} K=2^17 chunk=128) ==",
          flush=True)
    t_pre = scan_bench('preprocess', body_pre)
    t_bin = scan_bench('pre+binning', body_bin)
    t_fwd = scan_bench('pre+bin+blendfwd', body_fwd)
    t_fb = scan_bench('full fwd+bwd', body_fwdbwd)
    print(f"  deltas: binning {1e3*(t_bin-t_pre):.3f}  blend_fwd "
          f"{1e3*(t_fwd-t_bin):.3f}  bwd_extra {1e3*(t_fb-t_fwd):.3f} ms",
          flush=True)

    # realistic binning inputs for micro-ops
    pre0 = jax.jit(lambda g, v: preprocess(g, v, cfg))(g, mkview(jnp.zeros(())))
    b0 = jax.jit(lambda p: build_tile_lists(p, cfg))(pre0)
    npairs = int(b0.num_pairs)
    K = cfg.pair_capacity
    T = cfg.num_tiles
    print(f"== micro-ops (pairs={npairs} K={K} T={T}) ==", flush=True)

    depths0 = np.asarray(pre0.depths)
    touched0 = np.asarray(pre0.tiles_touched)

    # depth argsort [n]
    def body_argsort(c, a, x):
        o = jnp.argsort(x + 0.0 * c, stable=True)
        return c + 0.0 * jnp.sum(o).astype(jnp.float32)
    scan_bench('argsort n', body_argsort, jnp.asarray(depths0))

    # stamped scatter [5, K] at n positions
    excl0 = np.concatenate([[0], np.cumsum(touched0)[:-1]]).astype(np.int32)
    stamp_pos = jnp.asarray(np.where(touched0 > 0, excl0, K).astype(np.int32))
    vals5 = jnp.asarray(rng.integers(1, 1 << 20, (5, n)).astype(np.int32))

    def body_scatter(c, a, xs):
        sp, v = xs
        st = jnp.zeros((5, K), jnp.int32).at[:, sp].max(
            v + c.astype(jnp.int32), mode='drop')
        return c + 0.0 * jnp.sum(st[:, ::4096]).astype(jnp.float32)
    scan_bench('scatter [5,n]->[5,K]', body_scatter, (stamp_pos, vals5))

    # cummax [5, K]
    big5 = jnp.asarray(rng.integers(0, 1 << 20, (5, K)).astype(np.int32))

    def body_cummax(c, a, x):
        f = jax.lax.cummax(x + c.astype(jnp.int32), axis=1)
        return c + 0.0 * jnp.sum(f[:, ::4096]).astype(jnp.float32)
    scan_bench('cummax [5,K]', body_cummax, big5)

    # fused single-key i32 sort [K]
    keys = jnp.asarray(rng.integers(0, 1 << 30, (K,)).astype(np.int32))

    def body_sort(c, a, x):
        s = jax.lax.sort(x + c.astype(jnp.int32))
        return c + 0.0 * jnp.sum(s[::4096]).astype(jnp.float32)
    scan_bench('lax.sort i32 [K]', body_sort, keys)

    # tile math: dynamic mod/div over [K]
    local0 = jnp.asarray(rng.integers(0, 1 << 10, (K,)).astype(np.int32))
    rw0 = jnp.asarray(rng.integers(1, 12, (K,)).astype(np.int32))

    def body_moddiv(c, a, xs):
        l, w = xs
        l = l + c.astype(jnp.int32)
        tx = l % w
        ty = l // w
        return c + 0.0 * jnp.sum(tx[::4096] + ty[::4096]).astype(jnp.float32)
    scan_bench('mod+div [K] dyn', body_moddiv, (local0, rw0))

    # searchsorted T+1 queries into sorted [K]
    tiles_sorted = jnp.sort(jnp.asarray(
        rng.integers(0, T, (K,)).astype(jnp.int32)))
    tt = jnp.arange(T + 1, dtype=jnp.int32)

    def body_ss(c, a, xs):
        ts, q = xs
        s = jnp.searchsorted(ts, q + 0 * c.astype(jnp.int32), side='left')
        return c + 0.0 * jnp.sum(s).astype(jnp.float32)
    scan_bench('searchsorted T+1 in K', body_ss, (tiles_sorted, tt))

    # feat row gather [K+C, 128] from [n+1, 128]
    featsrc = jnp.asarray(rng.normal(size=(n + 1, 128)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, n, (K + cfg.chunk,)).astype(np.int32))

    def body_gather(c, a, xs):
        f, i = xs
        out = (f + c)[i]
        return c + 0.0 * jnp.sum(out[::1024, ::32])
    scan_bench('row gather [K,128]', body_gather, (featsrc, gidx))

    # segment_sum [K, 9] -> n rows
    gf = jnp.asarray(rng.normal(size=(K, 9)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, n, (K,)).astype(np.int32))

    def body_segsum(c, a, xs):
        x, s = xs
        o = jax.ops.segment_sum(x + c, s, num_segments=n + 1)
        return c + 0.0 * jnp.sum(o[::64])
    scan_bench('segment_sum [K,9]->n', body_segsum, (gf, seg))

    # [K] elementwise f32 pass cost (10 fused ops)
    kf = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))

    def body_ew(c, a, x):
        y = x + c
        for _ in range(10):
            y = y * 1.000001 + 0.5
        return c + 0.0 * jnp.sum(y[::4096])
    scan_bench('elementwise x10 [K]', body_ew, kf)


if __name__ == '__main__':
    main()
