"""Densification-gradient UNIT regression (round-3 white-render collapse).

The reference thresholds ``densify_grad_threshold=0.0002`` against the
viewspace gradient in NDC units — its CUDA backward multiplies the pixel
gradient by ddelx_dx = 0.5*W before the norm
(/root/reference/my_ext/_C/src/nerf/gaussian_render.cu:239,329;
networks/gaussian_splatting.py:503-513). Our means2d lives in PIXEL
coordinates, so the accumulated stat must be rescaled by (W/2, H/2);
without it the threshold is effectively (W/2)x too high, densification
never fires, and the population can only shrink until every Gaussian is
pruned (the run renders pure background from then on, with a finite loss
and exactly-zero gradients).

These tests pin (a) the unit contract and (b) that the production trainer
actually GROWS the population under the default threshold.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.models.gaussian_splatting import (GaussianConfig,
                                                 accumulate_stats,
                                                 init_from_pcd)


def test_accumulate_stats_ndc_units(rng):
    pts = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
    cols = rng.uniform(size=(10, 3)).astype(np.float32)
    m = init_from_pcd(pts, cols, GaussianConfig(capacity=16, sh_degree=1))
    radii = jnp.full((16,), 2, jnp.int32)
    g_pix = jnp.ones((16, 2), jnp.float32) * 1e-5
    m2 = accumulate_stats(m, radii, g_pix, image_size=(400, 200))
    # NDC norm = ||(1e-5 * 200, 1e-5 * 100)|| = 1e-5 * sqrt(200^2 + 100^2)
    expect = 1e-5 * np.hypot(200.0, 100.0)
    np.testing.assert_allclose(np.asarray(m2.xyz_grad_accum[:10]), expect,
                               rtol=1e-6)


@pytest.mark.integration
def test_trainer_densifies_under_default_threshold():
    """A short real trainer run at the DEFAULT densify_grad_threshold must
    add Gaussians (the collapsed run had 2000 -> 109 -> 0 because the
    un-scaled stat never crossed 0.0002)."""
    from sk_gs_tpu.data.synthetic import make_synthetic_scene
    from sk_gs_tpu.framework.trainer import SKGSTrainer
    from sk_gs_tpu.models import sk_gs
    from sk_gs_tpu.models.deform import DeformNetConfig, SkeletonNetConfig
    from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
    from sk_gs_tpu.render import RasterConfig

    scene, meta, gt = make_synthetic_scene(seed=0, num_links=2,
                                           gauss_per_link=60, num_frames=4,
                                           h=64, w=64,
                                           pair_capacity=2 ** 14, chunk=64)
    cfg = sk_gs.SKGSConfig(
        gauss=GaussianConfig(
            capacity=512, sh_degree=1,
            # default densify_grad_threshold (0.0002) on purpose
            densify_interval=(10, 10, 100000),
            prune_interval=(10, 10, 100000),
            opacity_reset_interval=(100000, 100000, -1),
            init_densify_prune_interval=(10, 0, -1),
            init_opacity_reset_interval=(100000, 0, -1)),
        net=DeformNetConfig(depth=2, width=32, is_blender=True),
        sk_net=SkeletonNetConfig(out_dims=(4, 4, 3), width=32, depth=2,
                                 skips=(1,)),
        train_schedule=(('static', 0), ('init_fix', 60), ('init', 0),
                        ('sp_fix', 0), ('sp', 0), ('sk_init', 0),
                        ('sk_fix', 0), ('sk', 0)),
        num_superpoints=8, num_knn=3, hyper_dim=0,
        num_frames=meta.num_frames, sk_knn_num=3,
        init_num_times=2, init_sampling_step=100000,
        joint_init_steps=5, joint_update_interval=(5, 25, 45))
    rcfg = RasterConfig(image_width=64, image_height=64, sh_degree=1,
                        pair_capacity=2 ** 14, chunk=64, use_pallas=False)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, size=(120, 3)).astype(np.float32)
    cols = rng.uniform(size=(120, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, cfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), cfg, base,
                             np.asarray(meta.train_times))
    trainer = SKGSTrainer(cfg, rcfg, scene, meta, model, pcd=(pts, cols),
                          gs_knn_num=3, gs_knn_update_interval=(10, 60))
    n0 = int(jnp.sum(trainer.state.model.alive))
    for step in range(1, 51):
        trainer.train_step(step)
    n1 = int(jnp.sum(trainer.state.model.alive))
    assert n1 > n0, (f'densification never fired: {n0} -> {n1} alive '
                     f'(grad-unit regression)')
