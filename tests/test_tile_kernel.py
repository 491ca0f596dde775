"""Pallas tile kernel vs oracle / XLA blend (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sk_gs_tpu.render.tile_kernel as tk
from sk_gs_tpu.render import (GaussianInputs, RasterConfig, composite_background,
                              preprocess, render, render_reference)
from tests.test_render import CFG, build_inputs, make_view


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(tk, 'INTERPRET', True)


CFG_P = CFG._replace(use_pallas=True, chunk=64)


class TestPallasKernel:
    @pytest.mark.parametrize('tile_h', [16, 8])
    @pytest.mark.integration
    def test_forward_matches_oracle(self, rng, tile_h):
        cfg = CFG_P._replace(tile_h=tile_h)
        g = build_inputs(rng, 200)
        view = make_view()
        out = render(g, view, cfg)
        pre = preprocess(g, view, cfg)
        ref = render_reference(pre, g.opacities, cfg)
        np.testing.assert_allclose(np.asarray(out['images']),
                                   np.asarray(ref['images']), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out['opacity']),
                                   np.asarray(ref['opacity']), atol=3e-5)

    @pytest.mark.parametrize('tile_h', [16, 8])
    @pytest.mark.integration
    def test_gradients_match_oracle(self, rng, tile_h):
        cfg = CFG_P._replace(tile_h=tile_h)
        g = build_inputs(rng, 80)
        view = make_view()
        tgt = jnp.asarray(rng.uniform(size=(48, 64, 3)).astype(np.float32))

        def loss(renderer, means, scales, rots, opa, sh):
            gg = GaussianInputs(means, scales, rots, opa, sh=sh)
            out = renderer(gg)
            img = composite_background(out['images'], out['opacity'], jnp.ones(3))
            return jnp.mean(jnp.abs(img - tgt)) + 0.1 * jnp.mean(out['opacity'])

        def prod_render(gg):
            return render(gg, view, cfg)

        def ref_render(gg):
            pre = preprocess(gg, view, cfg)
            return render_reference(pre, gg.opacities, cfg)

        args = (g.means3d, g.scales, g.rotations, g.opacities, g.sh)
        gp = jax.grad(lambda *a: loss(prod_render, *a), argnums=(0, 1, 2, 3, 4))(*args)
        gr = jax.grad(lambda *a: loss(ref_render, *a), argnums=(0, 1, 2, 3, 4))(*args)
        for a, b, name in zip(gp, gr, ['means', 'scales', 'rots', 'opa', 'sh']):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=3e-4,
                                       err_msg=f'pallas grad mismatch: {name}')

    def test_cumulative_helpers(self):
        x = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.0, (64, 256)).astype(np.float32))
        # helpers run inside pallas; emulate via interpret-mode pallas_call
        from jax.experimental import pallas as pl

        def k(x_ref, o_ref):
            o_ref[:] = tk._cumprod_sublanes(x_ref[:])

        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype), interpret=True)(x)
        np.testing.assert_allclose(np.asarray(out), np.cumprod(np.asarray(x), 0),
                                   rtol=1e-5)

        def k2(x_ref, o_ref):
            o_ref[:] = tk._cumsum_sublanes(x_ref[:])

        out2 = pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype), interpret=True)(x)
        np.testing.assert_allclose(np.asarray(out2), np.cumsum(np.asarray(x), 0),
                                   rtol=1e-5)
