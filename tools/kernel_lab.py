#!/usr/bin/env python
"""A/B lab for the Pallas blend kernels on real TPU.

Measures, inside one jitted lax.scan (per-call tunnel dispatch is ~2-9 ms):
  - pallas fwd kernel alone (pre-built tile-sorted features)
  - pallas bwd kernel alone
  - full blend fwd+bwd via the custom VJP (includes feat gather + segment_sum)

Knobs come from the CLI and override sk_gs_tpu.render.tile_kernel.IMPL:

  python tools/kernel_lab.py --cumprod concat --cumsum mxu --gate 1 \
      --chunk 128 [--size 400] [--n 20000]
"""
import argparse
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cumprod', default='concat')
    ap.add_argument('--cumsum', default='mxu')
    ap.add_argument('--gate', type=int, default=1)
    ap.add_argument('--chunk', type=int, default=128)
    ap.add_argument('--size', type=int, default=400)
    ap.add_argument('--n', type=int, default=20000)
    ap.add_argument('--reps', type=int, default=32)
    ap.add_argument('--cap', type=int, default=2 ** 17)
    ap.add_argument('--diag', default='none')
    ap.add_argument('--schedule', default=None)
    ap.add_argument('--qform', default=None)
    ap.add_argument('--colsum', default=None)
    ap.add_argument('--moments', default=None)
    ap.add_argument('--matprec', default=None)
    ap.add_argument('--grad_reduce', default=None,
                    help="'scatter' | 'sorted' pair-grad reduction A/B")
    ap.add_argument('--tile_h', type=int, default=16,
                    help='tile height in px (16 = CUDA parity; 8 = 16x8)')
    ap.add_argument('--stage_bf16', type=int, default=None,
                    help='stage DMA feature rows in bf16 (1) vs f32 (0)')
    ap.add_argument('--t_eps', type=float, default=None,
                    help='override the transmittance early-out threshold '
                         '(ceiling probe for per-pixel termination)')
    ap.add_argument('--sweep', action='store_true',
                    help='run the predefined knob sweep in one process')
    args = ap.parse_args()

    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / '.jax_cache'))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    if args.sweep:
        combos = [
            dict(cumprod='roll', cumsum='mxu_default', gate=1, chunk=128),
            dict(cumprod='roll', cumsum='concat', gate=1, chunk=128),
            dict(cumprod='roll', cumsum='mxu_default', gate=1, chunk=128,
                 diag='nomath'),
            dict(cumprod='roll', cumsum='mxu_default', gate=1, chunk=128,
                 diag='nodma'),
            dict(cumprod='roll', cumsum='mxu_default', gate=1, chunk=128),
        ]
        for c in combos:
            run_combo(args, **c)
    else:
        run_combo(args, args.cumprod, args.cumsum, args.gate, args.chunk,
                  args.diag)


def run_combo(args, cumprod, cumsum, gate, chunk, diag='none'):
    import jax, jax.numpy as jnp
    from sk_gs_tpu.render import RasterConfig
    from sk_gs_tpu.render.settings import GaussianInputs, ViewParams
    from sk_gs_tpu.render.preprocess import preprocess
    from sk_gs_tpu.render.binning import build_tile_lists
    from sk_gs_tpu.render import tile_kernel as tk
    import sk_gs_tpu.ops.transforms as tf

    if args.stage_bf16 is not None:
        tk.IMPL['stage_bf16'] = bool(args.stage_bf16)
    if args.t_eps is not None:
        tk.T_EPS = float(args.t_eps)
    tk.IMPL['cumprod'] = cumprod
    tk.IMPL['cumsum'] = cumsum
    tk.IMPL['gate_dma'] = bool(gate)
    tk.IMPL['diag'] = diag
    for knob in ('schedule', 'qform', 'colsum', 'moments', 'matprec',
                 'grad_reduce'):
        val = getattr(args, knob, None)
        if val is not None:
            tk.IMPL[knob] = val
    print(f"\n== IMPL={tk.IMPL} chunk={chunk} size={args.size} n={args.n} ==",
          flush=True)

    rng = np.random.default_rng(3)
    n = args.n
    g = GaussianInputs(
        means3d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.7),
        scales=jnp.asarray(np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.4 - 3.8)),
        rotations=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)))
    W = H = args.size
    cfg = RasterConfig(image_width=W, image_height=H, pair_capacity=args.cap,
                       chunk=chunk, use_pallas=True, tile_h=args.tile_h)
    Tv2c = tf.perspective_opencv(jnp.asarray(0.8), size=(W, H))
    tanf = jnp.asarray(np.tan(0.4), jnp.float32)
    eye = 4.0 * jnp.asarray([0.0, 0.0, -1.0])
    view = ViewParams(
        Tw2v=tf.look_at(eye, jnp.zeros(3), jnp.asarray([0.0, -1.0, 0.0]),
                        coord='opencv'),
        Tv2c=Tv2c, campos=eye, tan_fovx=tanf, tan_fovy=tanf)

    # binned inputs, computed once
    @jax.jit
    def prep(g, view):
        pre = preprocess(g, view, cfg)
        b = build_tile_lists(pre, cfg)
        do = b.depth_order
        pad1 = lambda x: jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
        xys = pad1(pre.means2d)[do]
        conic = pad1(pre.conic)[do]
        opa = pad1(g.opacities)[do]
        col = pad1(g.colors)[do]
        feat_s = tk._build_feat_sorted(b.sort_gauss, xys, conic, opa, col)
        return b, feat_s, (xys, conic, opa, col), b.num_pairs

    b, feat_s, padded, npairs = prep(g, view)
    nc = tk.num_chunks(cfg)
    live = int(np.sum(np.asarray(b.chunk_valid) > 0))
    print(f"pairs={int(npairs)} grid_chunks={nc} live_chunks={live}",
          flush=True)

    R = args.reps

    # All large arrays ride as jit ARGUMENTS (the `env` pytree), never as
    # closure captures: a captured array lowers to an HLO constant and at
    # n=100k/cap=2^20 the 36 MB feat_s blows the axon tunnel's remote_compile
    # request-size limit (HTTP 413).
    def scan_bench(name, body, env):
        @jax.jit
        def run(z, env):
            tot, _ = jax.lax.scan(lambda c, _: (body(c, env), None), z,
                                  jnp.arange(R))
            return tot
        t0 = time.time()
        jax.block_until_ready(run(jnp.zeros(()), env))
        compile_s = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = run(jnp.zeros(()), env)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / (reps * R)
        print(f"{name:22s} {dt*1e3:8.3f} ms/iter  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    ch = 3
    # loop-variant chunk metadata defeats loop-invariant hoisting; 0-cost
    def perturb(c, b):
        z = (0.0 * c).astype(jnp.int32)
        return b.chunk_tile + z, b.chunk_start_flag + z, b.chunk_valid + z, \
            b.chunk_src + z

    tile_sched = tk.IMPL['schedule'] == 'tile'

    def perturb_tile(c, b):
        z = (0.0 * c).astype(jnp.int32)
        return b.tile_start + z, b.tile_count + z

    if tile_sched:
        def body_fwd(c, env):
            ts, tcn = perturb_tile(c, env['b'])
            color, alpha = tk._pallas_forward_tile(env['feat_s'], ts, tcn,
                                                   cfg, ch)
            return c + 0.0 * (jnp.sum(color[::64]) + jnp.sum(alpha[::64]))

        color0, alpha0 = jax.jit(
            lambda fs, ts, tc: tk._pallas_forward_tile(fs, ts, tc, cfg, ch)
        )(feat_s, b.tile_start, b.tile_count)
    else:
        def body_fwd(c, env):
            ct, cs, sv, sc = perturb(c, env['b'])
            color, alpha = tk._pallas_forward(env['feat_s'], ct, cs, sv, sc,
                                              cfg, ch)
            return c + 0.0 * (jnp.sum(color[::64]) + jnp.sum(alpha[::64]))

        color0, alpha0 = jax.jit(
            lambda fs, b: tk._pallas_forward(fs, b.chunk_tile,
                                             b.chunk_start_flag,
                                             b.chunk_valid, b.chunk_src,
                                             cfg, ch))(feat_s, b)
    gcol = jnp.ones_like(color0) * 0.3
    galp = jnp.ones_like(alpha0) * 0.1

    if tile_sched:
        def body_bwd(c, env):
            ts, tcn = perturb_tile(c, env['b'])
            gfeat = tk._pallas_backward_tile(env['feat_s'], ts, tcn,
                                             env['color0'], env['alpha0'],
                                             env['gcol'], env['galp'], cfg,
                                             ch)
            return c + 0.0 * jnp.sum(gfeat[::512, ::32])
    else:
        def body_bwd(c, env):
            ct, cs, sv, sc = perturb(c, env['b'])
            gfeat = tk._pallas_backward(env['feat_s'], ct, cs, sv, sc,
                                        env['color0'], env['alpha0'],
                                        env['gcol'], env['galp'], cfg, ch)
            return c + 0.0 * jnp.sum(gfeat[::512, ::32])

    def body_full(c, env):
        b0 = env['b']
        ct, cs, sv, sc = perturb(c, b0)
        b2 = b0._replace(chunk_tile=ct, chunk_start_flag=cs, chunk_valid=sv,
                         chunk_src=sc)
        xys, conic, opa, col = env['padded']

        def loss(xys, conic, opa, col):
            tc, ta = tk._blend_custom(
                b2.sort_gauss, b2.chunk_tile, b2.chunk_start_flag,
                b2.chunk_valid, b2.chunk_src, b2.tile_start, b2.tile_count,
                b2.tile_nonempty, xys, conic, opa, col, cfg)
            return jnp.sum(tc * 0.3) + jnp.sum(ta * 0.1)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            xys, conic, opa, col)
        return c + val * 0.0 + 0.0 * sum(jnp.sum(x) for x in grads)

    env = dict(b=b, feat_s=feat_s, color0=color0, alpha0=alpha0,
               gcol=gcol, galp=galp, padded=padded)
    t_f = scan_bench('pallas fwd', body_fwd, env)
    t_b = scan_bench('pallas bwd', body_bwd, env)
    if diag == 'none':
        t_fb = scan_bench('blend fwd+bwd (vjp)', body_full, env)
        print(f"summary: fwd {t_f*1e3:.3f}  bwd {t_b*1e3:.3f}  "
              f"vjp_total {t_fb*1e3:.3f}  "
              f"(overhead vs f+b: {1e3*(t_fb-t_f-t_b):.3f} ms)", flush=True)
    else:
        print(f"summary[{diag}]: fwd {t_f*1e3:.3f}  bwd {t_b*1e3:.3f}",
              flush=True)


if __name__ == '__main__':
    main()
