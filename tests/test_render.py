"""Renderer correctness: XLA blend path vs the per-pixel oracle, forward and
gradients (the BASELINE 'grad allclose' gate, mirroring the reference's
check_C_runtime dual-path oracle strategy, SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.ops import transforms as tf
from sk_gs_tpu.render import (GaussianInputs, RasterConfig, ViewParams,
                              composite_background, preprocess, render,
                              render_reference)


def make_scene(rng, n=300, sh_degree=2):
    """Random Gaussian cloud near the origin viewed from z=-4 (opencv)."""
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.8
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.5 - 3.0)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opa = 1.0 / (1.0 + np.exp(-rng.normal(size=(n,)).astype(np.float32)))
    nb = (sh_degree + 1) ** 2
    sh = rng.normal(size=(n, nb, 3)).astype(np.float32) * 0.3
    return means, scales, q, opa, sh


def make_view(w=64, h=48):
    eye = jnp.asarray([0.3, -0.2, -4.0])
    Tw2v = tf.look_at(eye, jnp.zeros(3), jnp.asarray([0.0, -1.0, 0.0]), coord='opencv')
    fovy = 0.8
    fovx = 2.0 * np.arctan(np.tan(fovy / 2) * w / h)
    Tv2c = tf.perspective_opencv(jnp.asarray(fovy), size=(w, h))
    return ViewParams(Tw2v=Tw2v, Tv2c=Tv2c, campos=eye,
                      tan_fovx=jnp.asarray(np.tan(fovx / 2), jnp.float32),
                      tan_fovy=jnp.asarray(np.tan(fovy / 2), jnp.float32))


def build_inputs(rng, n=300, sh_degree=2):
    means, scales, q, opa, sh = make_scene(rng, n, sh_degree)
    return GaussianInputs(
        means3d=jnp.asarray(means), scales=jnp.asarray(scales),
        rotations=jnp.asarray(q), opacities=jnp.asarray(opa),
        sh=jnp.asarray(sh))


CFG = RasterConfig(image_width=64, image_height=48, sh_degree=2,
                   pair_capacity=2 ** 14, chunk=64, use_pallas=False)


class TestPreprocess:
    def test_center_gaussian_projects_to_center(self):
        g = GaussianInputs(
            means3d=jnp.zeros((1, 3)), scales=jnp.full((1, 3), 0.1),
            rotations=jnp.asarray([[0.0, 0, 0, 1]]), opacities=jnp.asarray([0.9]),
            colors=jnp.asarray([[1.0, 0, 0]]))
        view = make_view()
        pre = preprocess(g, view, CFG)
        assert bool(pre.visible[0])
        xy = np.asarray(pre.means2d[0])
        # ndc (0,0) -> pixel ((W-1)/2, (H-1)/2) up to the eye offset
        assert 20 < xy[0] < 44 and 12 < xy[1] < 36
        assert float(pre.depths[0]) > 0
        assert int(pre.radius[0]) > 0

    def test_behind_camera_culled(self):
        g = GaussianInputs(
            means3d=jnp.asarray([[0.3, -0.2, -9.0]]), scales=jnp.full((1, 3), 0.1),
            rotations=jnp.asarray([[0.0, 0, 0, 1]]), opacities=jnp.asarray([0.9]),
            colors=jnp.asarray([[1.0, 0, 0]]))
        pre = preprocess(g, make_view(), CFG)
        assert not bool(pre.visible[0])
        assert int(pre.tiles_touched[0]) == 0
        assert not np.isfinite(float(pre.depths[0]))

    def test_mask_kills_gaussian(self, rng):
        g = build_inputs(rng, 8)
        g = g._replace(mask=jnp.zeros(8, bool))
        pre = preprocess(g, make_view(), CFG)
        assert not np.asarray(pre.visible).any()

    def test_isotropic_cov2d_radius_scales_with_size(self):
        view = make_view()
        pres = []
        for s in (0.05, 0.2):
            g = GaussianInputs(
                means3d=jnp.zeros((1, 3)), scales=jnp.full((1, 3), s),
                rotations=jnp.asarray([[0.0, 0, 0, 1]]), opacities=jnp.asarray([0.9]),
                colors=jnp.asarray([[1.0, 0, 0]]))
            pres.append(preprocess(g, view, CFG))
        assert int(pres[1].radius[0]) > int(pres[0].radius[0])


class TestBlendVsOracle:
    @pytest.mark.parametrize('tile_h', [16, 8])
    @pytest.mark.integration
    def test_forward_matches_oracle(self, rng, tile_h):
        CFG = globals()['CFG']._replace(tile_h=tile_h)
        g = build_inputs(rng, 300)
        view = make_view()
        out = render(g, view, CFG)
        pre = preprocess(g, view, CFG)
        ref = render_reference(pre, g.opacities, CFG)
        assert not bool(out['overflow'])
        np.testing.assert_allclose(np.asarray(out['images']),
                                   np.asarray(ref['images']), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out['opacity']),
                                   np.asarray(ref['opacity']), atol=2e-5)

    @pytest.mark.integration
    def test_gradients_match_oracle(self, rng):
        g = build_inputs(rng, 120)
        view = make_view()
        tgt = jnp.asarray(rng.uniform(size=(48, 64, 3)).astype(np.float32))

        def loss_prod(means, scales, rots, opa, sh):
            gg = GaussianInputs(means, scales, rots, opa, sh=sh)
            out = render(gg, view, CFG)
            img = composite_background(out['images'], out['opacity'], jnp.ones(3))
            return jnp.mean(jnp.abs(img - tgt)) + 0.1 * jnp.mean(out['opacity'])

        def loss_ref(means, scales, rots, opa, sh):
            gg = GaussianInputs(means, scales, rots, opa, sh=sh)
            pre = preprocess(gg, view, CFG)
            out = render_reference(pre, opa, CFG)
            img = composite_background(out['images'], out['opacity'], jnp.ones(3))
            return jnp.mean(jnp.abs(img - tgt)) + 0.1 * jnp.mean(out['opacity'])

        args = (g.means3d, g.scales, g.rotations, g.opacities, g.sh)
        gp = jax.grad(loss_prod, argnums=(0, 1, 2, 3, 4))(*args)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for a, b, name in zip(gp, gr, ['means', 'scales', 'rots', 'opa', 'sh']):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=3e-4,
                                       err_msg=f'grad mismatch: {name}')

    def test_empty_scene_renders_background(self, rng):
        g = build_inputs(rng, 16)
        g = g._replace(mask=jnp.zeros(16, bool))
        out = render(g, make_view(), CFG)
        assert float(jnp.abs(out['images']).max()) == 0.0
        assert float(jnp.abs(out['opacity']).max()) == 0.0
        img = composite_background(out['images'], out['opacity'], jnp.asarray([1.0, 0.5, 0.25]))
        np.testing.assert_allclose(np.asarray(img[0, 0]), [1.0, 0.5, 0.25], atol=1e-6)

    def test_means2d_offset_grad_nonzero(self, rng):
        g = build_inputs(rng, 60)
        view = make_view()
        off = jnp.zeros((60, 2))

        def loss(off):
            out = render(g, view, CFG, means2d_offset=off)
            return jnp.mean(out['images'] ** 2)

        grads = np.asarray(jax.grad(loss)(off))
        assert np.abs(grads).max() > 0

    def test_overflow_flag(self, rng):
        g = build_inputs(rng, 300)
        cfg_small = CFG._replace(pair_capacity=8)
        out = render(g, make_view(), cfg_small)
        assert bool(out['overflow'])

    def test_extras_channel(self, rng):
        g = build_inputs(rng, 60)
        g = g._replace(extras=jnp.ones((60, 2)))
        out = render(g, make_view(), CFG)
        assert out['extras'].shape == (48, 64, 2)
        # extras blend with the same weights as color: where opacity ~0, extras ~0
        e = np.asarray(out['extras'][..., 0])
        o = np.asarray(out['opacity'])
        np.testing.assert_allclose(e, o, atol=2e-5)


class TestTopkWeights:
    def test_topk_picks_dominant_gaussian(self, rng):
        from sk_gs_tpu.render import binning as binning_mod
        from sk_gs_tpu.render import blend_xla
        from sk_gs_tpu.render.preprocess import preprocess as pp
        # one big opaque gaussian in front, several faint behind
        n = 8
        means = np.zeros((n, 3), np.float32)
        means[0, 2] = -0.5  # closest to camera (camera at z=-4)
        g = GaussianInputs(
            means3d=jnp.asarray(means),
            scales=jnp.full((n, 3), 0.2),
            rotations=jnp.tile(jnp.asarray([[0.0, 0, 0, 1]]), (n, 1)),
            opacities=jnp.asarray([0.95] + [0.1] * (n - 1)),
            colors=jnp.ones((n, 3)))
        view = make_view()
        pre = pp(g, view, CFG)
        binned = binning_mod.build_tile_lists(pre, CFG)
        pad1 = lambda x: jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
        idx, w = blend_xla.topk_weights(
            binned, pad1(pre.means2d), pad1(pre.conic),
            pad1(g.opacities), CFG, k=3)
        assert idx.shape == (48, 64, 3)
        cy, cx = 24, 32
        assert int(idx[cy, cx, 0]) == 0  # dominant contributor first
        assert float(w[cy, cx, 0]) > 0.5
