"""End-to-end static 3DGS training slice: optimize a Gaussian cloud to fit a
rendered target (SURVEY §7 build-plan step 4, CPU-sized)."""
import jax
import jax.numpy as jnp
import numpy as np

from sk_gs_tpu.models import optim
from sk_gs_tpu.models.gaussian_splatting import (
    GaussianConfig, accumulate_stats, densify_and_prune, gaussian_inputs,
    init_from_pcd, lr_tree, render_gaussians, reset_opacity)
from sk_gs_tpu.models.losses import l1_loss, psnr, ssim_loss
from sk_gs_tpu.render import RasterConfig, composite_background, render
from tests.test_render import build_inputs, make_view
import pytest

pytestmark = pytest.mark.slow

RCFG = RasterConfig(image_width=64, image_height=48, sh_degree=2,
                    pair_capacity=2 ** 15, chunk=64, use_pallas=False)
GCFG = GaussianConfig(capacity=600, sh_degree=2)


def make_target(rng, view):
    g = build_inputs(rng, 150, sh_degree=2)
    out = render(g, view, RCFG)
    return composite_background(out['images'], out['opacity'], jnp.ones(3))


class TestStaticTraining:
    def test_loss_decreases_and_psnr_improves(self, rng):
        view = make_view()
        target = make_target(rng, view)

        pts = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
        cols = rng.uniform(size=(400, 3)).astype(np.float32)
        model = init_from_pcd(pts, cols, GCFG)
        opt_state = optim.adam_init(model.params)

        @jax.jit
        def train_step(model, opt_state, lrs, key):
            def loss_fn(params, m2d_off):
                m = model._replace(params=params)
                out = render_gaussians(m, view, RCFG, GCFG, means2d_offset=m2d_off)
                img = composite_background(out['images'], out['opacity'], jnp.ones(3))
                loss = 0.8 * l1_loss(img, target) + 0.2 * ssim_loss(img, target)
                return loss, out

            m2d_off = jnp.zeros((model.capacity, 2))
            (loss, out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                    has_aux=True)(model.params, m2d_off)
            pgrads, m2d_grad = grads
            new_params, new_opt = optim.adam_update(pgrads, opt_state,
                                                    model.params, lrs)
            model = model._replace(params=new_params)
            model = accumulate_stats(model, out['radii'], m2d_grad,
                                     image_size=(RCFG.image_width,
                                                 RCFG.image_height))
            return model, new_opt, loss, out

        losses = []
        key = jax.random.PRNGKey(0)
        for step in range(120):
            lrs = lr_tree(GCFG, step, spatial_scale=3.0)
            model, opt_state, loss, out = train_step(model, opt_state, lrs, key)
            losses.append(float(loss))

        assert losses[-1] < losses[0] * 0.7, f"no convergence: {losses[0]} -> {losses[-1]}"
        out = render_gaussians(model, view, RCFG, GCFG)
        img = composite_background(out['images'], out['opacity'], jnp.ones(3))
        final_psnr = float(psnr(img, target))
        assert final_psnr > 15.0, f"psnr {final_psnr}"

    def test_densify_and_prune_bookkeeping(self, rng):
        pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        cols = rng.uniform(size=(50, 3)).astype(np.float32)
        model = init_from_pcd(pts, cols, GaussianConfig(capacity=128, sh_degree=2))
        opt_state = optim.adam_init(model.params)

        # fake large accumulated gradients on first 10 gaussians
        model = model._replace(
            xyz_grad_accum=model.xyz_grad_accum.at[:10].set(1.0),
            denom=model.denom.at[:10].set(1.0))
        n0 = int(model.num_alive)
        key = jax.random.PRNGKey(1)
        cfg = GaussianConfig(capacity=128, sh_degree=2)
        model2, opt2, stats = jax.jit(
            lambda m, o: densify_and_prune(
                m, o, cfg, extent=3.0, key=key,
                do_densify=jnp.asarray(True), do_prune=jnp.asarray(False),
                size_threshold=jnp.asarray(0.0)))(model, opt_state)
        added = int(stats['n_cloned']) + int(stats['n_split'])
        assert added == 10
        assert int(model2.num_alive) == n0 + 10
        # moments of new rows zeroed
        assert float(jnp.abs(opt2.mu['xyz']).max()) == 0.0

        # prune everything via opacity threshold
        model3 = model2._replace(
            params={**model2.params,
                    'opacity': jnp.full_like(model2.params['opacity'], -20.0)})
        model4, _, stats = jax.jit(
            lambda m, o: densify_and_prune(
                m, o, cfg, extent=3.0, key=key,
                do_densify=jnp.asarray(False), do_prune=jnp.asarray(True),
                size_threshold=jnp.asarray(0.0)))(model3, opt2)
        assert int(model4.num_alive) == 0

    def test_capacity_overflow_drops(self, rng):
        pts = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
        cols = rng.uniform(size=(60, 3)).astype(np.float32)
        cfg = GaussianConfig(capacity=64, sh_degree=2)
        model = init_from_pcd(pts, cols, cfg)
        model = model._replace(xyz_grad_accum=model.xyz_grad_accum.at[:60].set(1.0),
                               denom=model.denom.at[:60].set(1.0))
        opt_state = optim.adam_init(model.params)
        model2, _, stats = densify_and_prune(
            model, opt_state, cfg, extent=3.0, key=jax.random.PRNGKey(0),
            do_densify=jnp.asarray(True), do_prune=jnp.asarray(False),
            size_threshold=jnp.asarray(0.0))
        assert int(stats['n_dropped']) == 56  # only 4 dead slots
        assert int(model2.num_alive) == 64

    def test_reset_opacity(self, rng):
        pts = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
        cols = rng.uniform(size=(20, 3)).astype(np.float32)
        cfg = GaussianConfig(capacity=32, sh_degree=2)
        model = init_from_pcd(pts, cols, cfg)
        opt_state = optim.adam_init(model.params)
        model2, _ = reset_opacity(model, opt_state)
        op = jax.nn.sigmoid(model2.params['opacity'][:20, 0])
        np.testing.assert_allclose(np.asarray(op), 0.01, atol=1e-5)
