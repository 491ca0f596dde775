"""End-to-end staged SK-GS training on a synthetic articulated scene.

Miniature version of the reference 80k-step schedule: a handful of steps per
stage, checking that every stage runs, transitions fire, and the loss
improves through the static/init/sp path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.data.synthetic import make_synthetic_scene
from sk_gs_tpu.framework.trainer import SKGSTrainer, check_interval_v2
from sk_gs_tpu.models import sk_gs
from sk_gs_tpu.models.deform import DeformNetConfig, SkeletonNetConfig
from sk_gs_tpu.models.gaussian_splatting import GaussianConfig, init_from_pcd
from sk_gs_tpu.render import RasterConfig

pytestmark = pytest.mark.slow


def tiny_cfg(num_frames):
    return sk_gs.SKGSConfig(
        gauss=GaussianConfig(
            capacity=256, sh_degree=1,
            densify_interval=(50, 10, 100000),
            prune_interval=(50, 10, 100000),
            opacity_reset_interval=(100000, 100000, -1)),
        net=DeformNetConfig(depth=2, width=64, is_blender=True),
        sk_net=SkeletonNetConfig(out_dims=(4, 4, 3), width=64, depth=2,
                                 skips=(1,)),
        train_schedule=(
            ('static', 0), ('init_fix', 5), ('init', 15), ('sp_fix', 5),
            ('sp', 20), ('sk_init', 5), ('sk_fix', 0), ('sk', 20)),
        num_superpoints=16,
        num_knn=3,
        hyper_dim=2,
        num_frames=num_frames,
        sk_knn_num=3,
        init_num_times=4,
        init_sampling_step=10,
        joint_init_steps=20,
        joint_update_interval=(5, 25, 45),
    )


@pytest.fixture(scope='module')
def synthetic():
    return make_synthetic_scene(seed=0, num_links=2, gauss_per_link=60,
                                num_frames=8, h=48, w=48,
                                pair_capacity=2 ** 13, chunk=64)


class TestCheckInterval:
    def test_interval_semantics(self):
        # (every, start, end) close='()' — parity with check_interval_v2
        assert check_interval_v2(600, 100, 500, 15000)
        assert not check_interval_v2(500, 100, 500, 15000)
        assert not check_interval_v2(650, 100, 500, 15000)
        assert check_interval_v2(500, 100, 500, 15000, close='[)')
        assert not check_interval_v2(15000, 100, 500, 15000)
        assert check_interval_v2(15000, 100, 500, -1)


class TestStagedTraining:
    def test_full_schedule_runs(self, synthetic):
        scene, meta, gt = synthetic
        cfg = tiny_cfg(meta.num_frames)
        rcfg = RasterConfig(image_width=48, image_height=48, sh_degree=1,
                            pair_capacity=2 ** 13, chunk=64, use_pallas=False)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1.5, 1.5, size=(200, 3)).astype(np.float32)
        cols = rng.uniform(size=(200, 3)).astype(np.float32)
        base = init_from_pcd(pts, cols, cfg.gauss)
        model = sk_gs.init_model(jax.random.PRNGKey(0), cfg, base,
                                 np.asarray(meta.train_times))
        trainer = SKGSTrainer(cfg, rcfg, scene, meta, model,
                              pcd=(pts, cols), gs_knn_num=5,
                              gs_knn_update_interval=(10, 70))

        stage_seen = set()
        losses_by_stage = {}
        for step in range(1, cfg.total_steps + 1):
            metrics = trainer.train_step(step)
            stage = cfg.stage_at(step)
            stage_seen.add(stage)
            losses_by_stage.setdefault(stage, []).append(metrics['loss'])
            assert np.isfinite(metrics['loss']), f"step {step} stage {stage}"

        assert {'init_fix', 'init', 'sp_fix', 'sp', 'sk_init', 'sk'} <= stage_seen
        assert trainer.state.sp_initialized
        assert trainer.state.reinit_done
        assert trainer.state.skeleton_initialized
        # model state sane after the whole schedule
        m = trainer.state.model
        assert bool(jnp.isfinite(m.params['xyz']).all())
        assert bool(jnp.isfinite(m.params['joints']).all())
        assert int(jnp.sum(m.sp_alive)) > 0
        assert int(jnp.sum(m.alive)) > 0

        # eval pipeline runs and returns sane metrics
        result = trainer.evaluate(scene, stage='sk')
        assert np.isfinite(result['PSNR'])
        assert 0.0 <= result['SSIM'] <= 1.0

    def test_static_convergence_through_trainer(self, synthetic):
        # static-only schedule on frame 0; loss must drop
        scene, meta, gt = synthetic
        cfg = tiny_cfg(meta.num_frames)._replace(
            train_schedule=(('static', 60),),
            init_sampling_step=10 ** 9)
        rcfg = RasterConfig(image_width=48, image_height=48, sh_degree=1,
                            pair_capacity=2 ** 13, chunk=64, use_pallas=False)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1.5, 1.5, size=(200, 3)).astype(np.float32)
        cols = rng.uniform(size=(200, 3)).astype(np.float32)
        base = init_from_pcd(pts, cols, cfg.gauss)
        model = sk_gs.init_model(jax.random.PRNGKey(1), cfg, base,
                                 np.asarray(meta.train_times))
        # single-frame scene (frame 0 repeated) so static can fit it
        one = scene._replace(
            images=jnp.tile(scene.images[:1], (4, 1, 1, 1)),
            Tw2v=jnp.tile(scene.Tw2v[:1], (4, 1, 1)),
            Tv2c=jnp.tile(scene.Tv2c[:1], (4, 1, 1)),
            campos=jnp.tile(scene.campos[:1], (4, 1)),
            tan_fovx=jnp.tile(scene.tan_fovx[:1], (4,)),
            tan_fovy=jnp.tile(scene.tan_fovy[:1], (4,)),
            times=jnp.zeros((4,)), time_ids=jnp.zeros((4,), jnp.int32),
            camera_ids=jnp.zeros((4,), jnp.int32))
        trainer = SKGSTrainer(cfg, rcfg, one, meta, model, pcd=(pts, cols))
        losses = [trainer.train_step(s)['loss'] for s in range(1, 61)]
        assert losses[-1] < losses[0] * 0.8, f"{losses[0]} -> {losses[-1]}"


class TestSPGSSchedule:
    def test_sp_only_schedule(self, synthetic):
        """SP-GS predecessor: superpoint stages only, no skeleton
        (configs/d_nerf_sp_gs.yaml analogue)."""
        scene, meta, gt = synthetic
        cfg = tiny_cfg(meta.num_frames)._replace(
            train_schedule=(
                ('static', 0), ('init_fix', 5), ('init', 10), ('sp_fix', 5),
                ('sp', 25), ('sk_init', 0), ('sk_fix', 0), ('sk', 0)))
        rcfg = RasterConfig(image_width=48, image_height=48, sh_degree=1,
                            pair_capacity=2 ** 13, chunk=64, use_pallas=False)
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1.5, 1.5, size=(150, 3)).astype(np.float32)
        cols = rng.uniform(size=(150, 3)).astype(np.float32)
        base = init_from_pcd(pts, cols, cfg.gauss)
        model = sk_gs.init_model(jax.random.PRNGKey(3), cfg, base,
                                 np.asarray(meta.train_times))
        trainer = SKGSTrainer(cfg, rcfg, scene, meta, model, pcd=(pts, cols))
        for step in range(1, cfg.total_steps + 1):
            m = trainer.train_step(step)
            assert np.isfinite(float(m['loss']))
        assert trainer.state.sp_initialized
        assert not trainer.state.skeleton_initialized  # never entered sk
        res = trainer.evaluate(scene, stage='sp')
        assert np.isfinite(res['PSNR'])


class TestMultiCamera:
    def test_wim_style_multicam_training(self, rng):
        """Multi-camera scene (several cameras per time id) through the
        trainer — exercises repeated time_ids in sp_cache writes."""
        from sk_gs_tpu.data.synthetic import make_synthetic_scene
        scene, meta, gt = make_synthetic_scene(
            seed=9, num_links=2, gauss_per_link=40, num_frames=4, h=32, w=32,
            pair_capacity=2 ** 11, chunk=64)
        # duplicate every frame from a second camera (orbit shifted)
        import jax.numpy as jnp
        s2 = scene._replace(
            images=jnp.concatenate([scene.images, scene.images[::-1]]),
            Tw2v=jnp.concatenate([scene.Tw2v, scene.Tw2v[::-1]]),
            Tv2c=jnp.concatenate([scene.Tv2c, scene.Tv2c[::-1]]),
            campos=jnp.concatenate([scene.campos, scene.campos[::-1]]),
            tan_fovx=jnp.concatenate([scene.tan_fovx, scene.tan_fovx]),
            tan_fovy=jnp.concatenate([scene.tan_fovy, scene.tan_fovy]),
            times=jnp.concatenate([scene.times, scene.times[::-1]]),
            time_ids=jnp.concatenate([scene.time_ids, scene.time_ids[::-1]]),
            camera_ids=jnp.concatenate([
                jnp.zeros_like(scene.camera_ids),
                jnp.ones_like(scene.camera_ids)]))
        cfg = tiny_cfg(meta.num_frames)._replace(
            train_schedule=(('init_fix', 3), ('init', 7), ('sp_fix', 3),
                            ('sp', 12)),
            init_sampling_step=5)
        rcfg = RasterConfig(image_width=32, image_height=32, sh_degree=1,
                            pair_capacity=2 ** 11, chunk=64, use_pallas=False)
        pts = rng.uniform(-1, 1, size=(80, 3)).astype(np.float32)
        cols = rng.uniform(size=(80, 3)).astype(np.float32)
        base = init_from_pcd(pts, cols, cfg.gauss)
        model = sk_gs.init_model(jax.random.PRNGKey(9), cfg, base,
                                 np.asarray(meta.train_times))
        trainer = SKGSTrainer(cfg, rcfg, s2, meta, model, pcd=(pts, cols))
        for step in range(1, cfg.total_steps + 1):
            m = trainer.train_step(step)
            assert np.isfinite(float(m['loss']))
