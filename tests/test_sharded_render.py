"""Sharded multi-chip rasterizer vs single-chip reference (8-dev CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sk_gs_tpu.parallel.sharded_render import make_sharded_render
from sk_gs_tpu.render import RasterConfig, composite_background, render
from tests.test_render import build_inputs, make_view

# 48 rows = 3 tile rows; pad to 4 bands x 1 tile row => use 64-row image
CFG = RasterConfig(image_width=64, image_height=64, sh_degree=2,
                   pair_capacity=2 ** 14, chunk=64, use_pallas=False)


@pytest.fixture(scope='module')
def mesh():
    devs = np.asarray(jax.devices()[:4]).reshape(4)
    return Mesh(devs, ('gs',))


class TestShardedRender:
    @pytest.mark.parametrize('tile_h', [16, 8])
    @pytest.mark.integration
    def test_matches_single_chip(self, mesh, rng, tile_h):
        cfg = CFG._replace(tile_h=tile_h)
        g = build_inputs(rng, 256)  # 256 divisible by 4
        view = make_view(w=64, h=64)
        ref = render(g, view, cfg)

        fn = make_sharded_render(mesh, cfg)
        with mesh:
            out = fn(g, view)
        np.testing.assert_allclose(np.asarray(out['images']),
                                   np.asarray(ref['images']), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out['opacity']),
                                   np.asarray(ref['opacity']), atol=3e-5)

    @pytest.mark.integration
    def test_gradients_match_single_chip(self, mesh, rng):
        g = build_inputs(rng, 128)
        view = make_view(w=64, h=64)
        tgt = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        fn = make_sharded_render(mesh, CFG)

        def loss_sharded(means, scales, rots, opa, sh):
            gg = g._replace(means3d=means, scales=scales, rotations=rots,
                            opacities=opa, sh=sh)
            with mesh:
                out = fn(gg, view)
            img = composite_background(out['images'], out['opacity'],
                                       jnp.ones(3))
            return jnp.mean(jnp.abs(img - tgt))

        def loss_ref(means, scales, rots, opa, sh):
            gg = g._replace(means3d=means, scales=scales, rotations=rots,
                            opacities=opa, sh=sh)
            out = render(gg, view, CFG)
            img = composite_background(out['images'], out['opacity'],
                                       jnp.ones(3))
            return jnp.mean(jnp.abs(img - tgt))

        args = (g.means3d, g.scales, g.rotations, g.opacities, g.sh)
        gs = jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4))(*args)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for a, b, name in zip(gs, gr, ['means', 'scales', 'rots', 'opa', 'sh']):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                       err_msg=f'sharded grad mismatch: {name}')


class TestExchangeRender:
    @pytest.mark.parametrize('tile_h', [16, 8])
    def test_all_to_all_matches_single_chip(self, mesh, rng, tile_h):
        from sk_gs_tpu.parallel.sharded_render import make_exchange_render
        cfg = CFG._replace(tile_h=tile_h)
        g = build_inputs(rng, 256)
        view = make_view(w=64, h=64)
        ref = render(g, view, cfg)
        fn = make_exchange_render(mesh, cfg)
        with mesh:
            out = fn(g, view)
        assert not bool(out['overflow'])
        np.testing.assert_allclose(np.asarray(out['images']),
                                   np.asarray(ref['images']), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out['opacity']),
                                   np.asarray(ref['opacity']), atol=3e-5)

    @pytest.mark.integration
    def test_all_to_all_gradients(self, mesh, rng):
        from sk_gs_tpu.parallel.sharded_render import make_exchange_render
        g = build_inputs(rng, 128)
        view = make_view(w=64, h=64)
        tgt = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        fn = make_exchange_render(mesh, CFG)

        def loss_ex(means):
            gg = g._replace(means3d=means)
            with mesh:
                out = fn(gg, view)
            img = composite_background(out['images'], out['opacity'],
                                       jnp.ones(3))
            return jnp.mean(jnp.abs(img - tgt))

        def loss_ref(means):
            out = render(g._replace(means3d=means), view, CFG)
            img = composite_background(out['images'], out['opacity'],
                                       jnp.ones(3))
            return jnp.mean(jnp.abs(img - tgt))

        ga = np.asarray(jax.grad(loss_ex)(g.means3d))
        gb = np.asarray(jax.grad(loss_ref)(g.means3d))
        scale = np.abs(gb).max() + 1e-8
        np.testing.assert_allclose(ga / scale, gb / scale, atol=5e-4)


class TestExchangePallas:
    """The Pallas blend runs band-local inside shard_map (VERDICT r1 #2a):
    the exchange renderer must produce the same image + radii/visible as the
    single-chip Pallas path."""

    def test_pallas_blend_in_shard_map(self, mesh, rng):
        from sk_gs_tpu.parallel.sharded_render import make_exchange_render
        from sk_gs_tpu.render import tile_kernel as tk
        g = build_inputs(rng, 256)
        view = make_view(w=64, h=64)
        cfg_p = CFG._replace(use_pallas=True)
        old = tk.INTERPRET
        tk.INTERPRET = True
        try:
            ref = render(g, view, cfg_p)
            fn = make_exchange_render(mesh, cfg_p)
            with mesh:
                out = fn(g, view)
        finally:
            tk.INTERPRET = old
        assert not bool(out['overflow'])
        np.testing.assert_allclose(np.asarray(out['images']),
                                   np.asarray(ref['images']), atol=3e-5)
        # radii/visible come from the local phase-A preprocess -> adaptive
        # density control works from this renderer
        np.testing.assert_array_equal(np.asarray(out['radii']),
                                      np.asarray(ref['radii']))
        np.testing.assert_array_equal(np.asarray(out['visible']),
                                      np.asarray(ref['visible']))
