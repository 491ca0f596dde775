"""Dynamic background types (random/random2/reference/checker) — per-step
in-graph compositing parity with the reference's get_background semantics
(/root/reference/datasets/base.py:125-170)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.data.base import (DYNAMIC_BG, image_checkerboard,
                                 sample_background, solid_background)


class TestBackgroundHelpers:
    def test_checkerboard_pattern(self):
        cb = image_checkerboard(32, 48, 8)
        assert cb.shape == (32, 48, 3)
        assert cb[0, 0, 0] == 0.5          # first cell gray
        assert cb[0, 8, 0] == 1.0          # next cell white
        assert cb[8, 0, 0] == 1.0
        assert cb[8, 8, 0] == 0.5

    def test_random_per_pixel(self):
        k = jax.random.PRNGKey(0)
        r = sample_background('random', k, 16, 16)
        assert r.shape == (16, 16, 3)
        assert float(jnp.std(r)) > 0.1     # varies across pixels

    def test_random2_single_color(self):
        k = jax.random.PRNGKey(0)
        r = sample_background('random2', k, 16, 16)
        assert r.shape == (16, 16, 3)
        # same color at every pixel (per-channel std ~ 0)
        assert float(jnp.std(r, axis=(0, 1)).max()) < 1e-4
        # but not a degenerate constant across channels
        assert float(jnp.std(r[0, 0])) > 1e-3

    def test_reference_returns_gt(self):
        k = jax.random.PRNGKey(0)
        ref = jnp.full((8, 8, 3), 0.3)
        out = sample_background('reference', k, 8, 8, reference_rgb=ref)
        np.testing.assert_allclose(np.asarray(out), 0.3)

    def test_solid_background_none_for_dynamic(self):
        for t in DYNAMIC_BG:
            assert solid_background(t) is None
        np.testing.assert_allclose(solid_background('white'), 1.0)
        np.testing.assert_allclose(solid_background('black'), 0.0)


class TestDynamicBgTraining:
    @pytest.mark.parametrize('bg_type', ['random', 'random2', 'checker'])
    @pytest.mark.integration
    def test_static_steps_run_with_rgba_scene(self, bg_type):
        from sk_gs_tpu.data.synthetic import make_synthetic_scene
        from sk_gs_tpu.framework.trainer import SKGSTrainer
        from sk_gs_tpu.models import sk_gs
        from sk_gs_tpu.models.deform import (DeformNetConfig,
                                             SkeletonNetConfig)
        from sk_gs_tpu.models.gaussian_splatting import (GaussianConfig,
                                                         init_from_pcd)
        from sk_gs_tpu.render import RasterConfig

        scene, meta, gt = make_synthetic_scene(
            seed=0, num_links=2, gauss_per_link=40, num_frames=4,
            h=32, w=32, pair_capacity=2 ** 12, chunk=64)
        # attach an alpha channel (rgba kept for DYNAMIC_BG scenes)
        alpha = (jnp.mean(scene.images, -1, keepdims=True) < 0.999
                 ).astype(jnp.float32)
        scene = scene._replace(
            images=jnp.concatenate([scene.images, alpha], axis=-1))
        meta.background_type = bg_type
        if bg_type == 'checker':
            meta.background = image_checkerboard(32, 32)
        else:
            meta.background = None

        cfg = sk_gs.SKGSConfig(
            gauss=GaussianConfig(
                capacity=128, sh_degree=0,
                densify_interval=(10 ** 6, 10, 10 ** 7),
                prune_interval=(10 ** 6, 10, 10 ** 7),
                opacity_reset_interval=(10 ** 6, 10 ** 6, -1)),
            net=DeformNetConfig(depth=2, width=32, is_blender=True),
            sk_net=SkeletonNetConfig(out_dims=(4, 4, 3), width=32, depth=2,
                                     skips=(1,)),
            train_schedule=(('static', 8),),
            num_superpoints=8, num_knn=3, hyper_dim=2,
            num_frames=meta.num_frames, sk_knn_num=3,
            init_num_times=2, init_sampling_step=10 ** 9,
            joint_init_steps=5, joint_update_interval=(5, 25, 10 ** 6))
        rcfg = RasterConfig(image_width=32, image_height=32, sh_degree=0,
                            pair_capacity=2 ** 12, chunk=64,
                            use_pallas=False)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1.5, 1.5, size=(100, 3)).astype(np.float32)
        cols = rng.uniform(size=(100, 3)).astype(np.float32)
        base = init_from_pcd(pts, cols, cfg.gauss)
        model = sk_gs.init_model(jax.random.PRNGKey(0), cfg, base,
                                 np.asarray(meta.train_times))
        trainer = SKGSTrainer(cfg, rcfg, scene, meta, model,
                              pcd=(pts, cols), gs_knn_num=3,
                              gs_knn_update_interval=(10 ** 6, 10 ** 7))
        for step in range(1, 9):
            metrics = trainer.train_step(step)
            assert np.isfinite(metrics['loss'])
        # eval composites RGBA gt against the static fallback bg
        result = trainer.evaluate(scene, stage='static')
        assert np.isfinite(result['PSNR'])
