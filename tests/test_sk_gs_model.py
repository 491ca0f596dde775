"""SK-GS model integration: stage forwards, transitions, skeleton init."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.models import optim, sk_gs, sk_gs_ops
from sk_gs_tpu.models.deform import DeformNetConfig, SkeletonNetConfig
from sk_gs_tpu.models.gaussian_splatting import GaussianConfig, init_from_pcd
from sk_gs_tpu.ops import se3


def small_cfg(n_frames=6, m=8):
    return sk_gs.SKGSConfig(
        gauss=GaussianConfig(capacity=64, sh_degree=1),
        net=DeformNetConfig(depth=2, width=32, is_blender=True),
        sk_net=SkeletonNetConfig(out_dims=(4, 4, 3), width=32, depth=2,
                                 skips=(1,)),
        num_superpoints=m,
        num_knn=3,
        hyper_dim=2,
        num_frames=n_frames,
        sk_knn_num=3,
        init_num_times=4,
        joint_init_steps=50,
    )


@pytest.fixture
def model_and_cfg(rng):
    cfg = small_cfg()
    pts = rng.uniform(-1, 1, size=(40, 3)).astype(np.float32)
    cols = rng.uniform(size=(40, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, cfg.gauss)
    times = np.linspace(0, 1, cfg.num_frames).astype(np.float32)
    model = sk_gs.init_model(jax.random.PRNGKey(0), cfg, base, times)
    return model, cfg


class TestStageForward:
    def test_static_stage(self, model_and_cfg):
        model, cfg = model_and_cfg
        out = sk_gs.forward_deltas(cfg, model, jnp.asarray(0.5), 'static')
        assert float(out.d_xyz) == 0.0

    def test_init_stage_small_deltas(self, model_and_cfg):
        model, cfg = model_and_cfg
        out = sk_gs.forward_deltas(cfg, model, jnp.asarray(0.5), 'init',
                                   key=jax.random.PRNGKey(1))
        # tiny-std head init -> near-zero warp at start
        assert out.d_xyz.shape == (64, 3)
        assert float(jnp.abs(out.d_xyz).max()) < 0.1

    @pytest.mark.integration
    def test_sp_stage_shapes_and_grads(self, model_and_cfg):
        model, cfg = model_and_cfg
        out = sk_gs.forward_deltas(cfg, model, jnp.asarray(0.3), 'sp')
        assert out.d_xyz.shape == (64, 3)
        assert out.d_rotation.shape == (64, 4)
        assert out.d_scaling.shape == (64, 3)
        assert out.aux['spT'].shape == (8, 7)
        assert out.aux['knn_w'].shape == (64, 3)

        def loss(params):
            m = model._replace(params=params)
            o = sk_gs.forward_deltas(cfg, m, jnp.asarray(0.3), 'sp')
            return jnp.sum(o.d_xyz ** 2) + jnp.sum(o.d_rotation ** 2)

        g = jax.grad(loss)(model.params)
        assert float(jnp.abs(g['sp_deform']['warp']['w']).sum()) > 0
        # sp_W receives gradient through the softmax weights
        assert float(jnp.abs(g['sp_W']).sum()) >= 0

    def test_sk_stage_runs_with_identity_skeleton(self, model_and_cfg):
        model, cfg = model_and_cfg
        # trivial skeleton: parents all root 0
        out = sk_gs.forward_deltas(cfg, model, jnp.asarray(0.3), 'sk',
                                   time_id=2)
        assert out.d_xyz.shape == (64, 3)
        assert jnp.isfinite(out.d_xyz).all()
        assert out.aux['skT'].shape == (8, 7)

    def test_sk_repose_delta_changes_output(self, model_and_cfg):
        model, cfg = model_and_cfg
        out0 = sk_gs.forward_deltas(cfg, model, jnp.asarray(0.3), 'sk', time_id=1)
        delta = jnp.zeros((8, 3)).at[:, 2].set(0.8)
        out1 = sk_gs.forward_deltas(cfg, model, jnp.asarray(0.3), 'sk',
                                    time_id=1, sk_r_delta=delta)
        assert float(jnp.abs(out1.d_xyz - out0.d_xyz).max()) > 1e-3


class TestTransitions:
    def test_init_superpoints_replaces_gaussians(self, model_and_cfg):
        model, cfg = model_and_cfg
        opt = optim.adam_init(model.params)
        model2, opt2 = sk_gs_ops.init_superpoints(cfg, model, opt,
                                                  jax.random.PRNGKey(2))
        assert int(jnp.sum(model2.alive)) == cfg.num_superpoints
        assert bool(jnp.all(model2.sp_alive))
        # sp_points match surviving gaussians
        np.testing.assert_allclose(
            np.asarray(model2.params['sp_points']),
            np.asarray(model2.params['xyz'][:cfg.num_superpoints]), atol=1e-6)

    def test_cache_all_frames(self, model_and_cfg):
        model, cfg = model_and_cfg
        cache = sk_gs_ops.compute_sp_transforms_all_frames(
            cfg, model.params, model.train_times)
        assert cache.shape == (cfg.num_frames, cfg.num_superpoints,
                               cfg.sp_cache_dim)
        # near-identity transforms at init (tiny head weights)
        q = cache[..., 3:7]
        np.testing.assert_allclose(np.asarray(jnp.abs(q[..., 3])), 1.0, atol=1e-3)

    def test_full_skeleton_init(self, model_and_cfg):
        model, cfg = model_and_cfg
        model2 = sk_gs_ops.init_skeleton(cfg, model, jax.random.PRNGKey(3),
                                         joint_steps=10, distill_steps=10)
        assert jnp.isfinite(model2.params['joints']).all()
        assert jnp.isfinite(model2.params['global_tr']).all()
        assert 0 <= int(model2.joint_root) < cfg.num_superpoints
        # after init, sk stage must run
        out = sk_gs.forward_deltas(cfg, model2, jnp.asarray(0.3), 'sk', time_id=1)
        assert jnp.isfinite(out.d_xyz).all()

    def test_superpoint_prune_split(self, model_and_cfg):
        model, cfg = model_and_cfg
        opt = optim.adam_init(model.params)
        model2, opt2, stats = sk_gs_ops.superpoint_prune_split(cfg, model, opt)
        assert jnp.isfinite(model2.params['sp_points']).all()
        total = int(jnp.sum(model2.sp_alive))
        assert 0 < total <= cfg.num_superpoints

    def test_superpoint_merge(self, model_and_cfg):
        model, cfg = model_and_cfg
        opt = optim.adam_init(model.params)
        # identical motion everywhere (tiny nets) -> many merges expected
        model2, _, stats = sk_gs_ops.superpoint_merge(cfg, model, opt,
                                                      jax.random.PRNGKey(4))
        assert int(stats['n_merged']) >= 0
        assert int(jnp.sum(model2.sp_alive)) + int(stats['n_merged']) \
            == cfg.num_superpoints


class TestSkCacheInterpolate:
    """test_time_interpolate: eval reads lerped sk_cache rows instead of
    re-running the skeleton net (kinematic, sk_gs.py:1080-1085)."""

    def test_cached_eval_matches_net_at_train_times(self, model_and_cfg):
        model, cfg = model_and_cfg
        cfg_tti = cfg._replace(test_time_interpolate=True)
        pts = model.params['xyz']
        # populate the cache the way the sk-family train step does
        rows = []
        for tid in range(cfg.num_frames):
            t = model.train_times[tid]
            out = sk_gs.sk_stage(cfg, model, pts, t, time_id=tid,
                                 training=True)
            rows.append(out.aux['cache_row'])
        model = model._replace(sk_cache=jnp.stack(rows))

        for tid in (0, cfg.num_frames - 1):
            t = model.train_times[tid]
            ref = sk_gs.sk_stage(cfg, model, pts, t, time_id=None,
                                 training=True)
            got = sk_gs.sk_stage(cfg_tti, model, pts, t, time_id=None,
                                 training=False)
            np.testing.assert_allclose(np.asarray(got.d_xyz),
                                       np.asarray(ref.d_xyz), atol=1e-5)
            np.testing.assert_allclose(np.asarray(got.d_rotation),
                                       np.asarray(ref.d_rotation), atol=1e-5)

    def test_interpolated_midpoint_is_finite_and_between(self, model_and_cfg):
        model, cfg = model_and_cfg
        cfg_tti = cfg._replace(test_time_interpolate=True)
        pts = model.params['xyz']
        rows = []
        for tid in range(cfg.num_frames):
            out = sk_gs.sk_stage(cfg, model, pts, model.train_times[tid],
                                 time_id=tid, training=True)
            rows.append(out.aux['cache_row'])
        model = model._replace(sk_cache=jnp.stack(rows))
        t_mid = 0.5 * (model.train_times[0] + model.train_times[1])
        got = sk_gs.sk_stage(cfg_tti, model, pts, t_mid, time_id=None,
                             training=False)
        assert np.isfinite(np.asarray(got.d_xyz)).all()


class TestModelKnobs:
    """which_rotation='lie' + sk_feature (sk_gs.py:414-418, 516-521, 1073)."""

    def _model(self, rng, cfg):
        pts = rng.uniform(-1, 1, size=(40, 3)).astype(np.float32)
        cols = rng.uniform(size=(40, 3)).astype(np.float32)
        base = init_from_pcd(pts, cols, cfg.gauss)
        times = np.linspace(0, 1, cfg.num_frames).astype(np.float32)
        return sk_gs.init_model(jax.random.PRNGKey(0), cfg, base, times)

    def test_lie_rotation_heads(self, rng):
        cfg = small_cfg()._replace(
            which_rotation='lie',
            sk_net=SkeletonNetConfig(out_dims=(3, 4, 3), width=32, depth=2,
                                     skips=(1,)))
        model = self._model(rng, cfg)
        out = sk_gs.sk_stage(cfg, model, model.params['xyz'],
                             jnp.asarray(0.3), time_id=1)
        assert out.aux['cache_row'].shape == (8, 10)  # 3 + 4 + 3
        # skT carries unit quaternions built via so3_exp
        q = out.aux['skT'][:, 3:7]
        np.testing.assert_allclose(
            np.asarray(jnp.sum(q * q, -1)), 1.0, atol=1e-5)

        # finite grads at the (identity) tiny-std init — the axis-angle
        # head sits exactly at the so3_exp singularity
        def loss(params):
            m = model._replace(params=params)
            o = sk_gs.sk_stage(cfg, m, m.params['xyz'], jnp.asarray(0.3),
                               time_id=1)
            return jnp.sum(jnp.square(o.d_xyz)) \
                + jnp.sum(jnp.square(o.aux['skT']))

        g = jax.grad(loss)(model.params)
        flat = jax.tree.leaves(jax.tree.map(
            lambda x: jnp.all(jnp.isfinite(x)), g))
        assert all(bool(v) for v in flat)

    def test_lie_cache_interpolation_round_trip(self, rng):
        cfg = small_cfg()._replace(
            which_rotation='lie',
            sk_net=SkeletonNetConfig(out_dims=(3, 4, 3), width=32, depth=2,
                                     skips=(1,)))
        model = self._model(rng, cfg)
        pts = model.params['xyz']
        rows = []
        for tid in range(cfg.num_frames):
            out = sk_gs.sk_stage(cfg, model, pts, model.train_times[tid],
                                 time_id=tid, training=True)
            rows.append(out.aux['cache_row'])
        model = model._replace(sk_cache=jnp.stack(rows))
        cfg_tti = cfg._replace(test_time_interpolate=True)
        for tid in (0, cfg.num_frames - 1):
            t = model.train_times[tid]
            ref = sk_gs.sk_stage(cfg, model, pts, t, time_id=None,
                                 training=True)
            got = sk_gs.sk_stage(cfg_tti, model, pts, t, time_id=None,
                                 training=False)
            np.testing.assert_allclose(np.asarray(got.d_xyz),
                                       np.asarray(ref.d_xyz), atol=1e-5)

    def test_sk_feature_changes_output(self, rng):
        dim = 4
        cfg = small_cfg()._replace(
            sk_feature_dim=dim,
            sk_net=SkeletonNetConfig(out_dims=(4, 4, 3), width=32, depth=2,
                                     skips=(1,), p_in_channels=3 + dim))
        model = self._model(rng, cfg)
        assert model.params['sk_feature'].shape == (8, dim)
        out0 = sk_gs.sk_stage(cfg, model, model.params['xyz'],
                              jnp.asarray(0.3), time_id=1)
        # perturb the features: the skeleton-net input changes, so the
        # net output (and the warp) must change
        p2 = dict(model.params)
        p2['sk_feature'] = p2['sk_feature'] + 1.0
        m2 = model._replace(params=p2)
        out1 = sk_gs.sk_stage(cfg, m2, m2.params['xyz'],
                              jnp.asarray(0.3), time_id=1)
        assert float(jnp.abs(out1.aux['cache_row']
                             - out0.aux['cache_row']).max()) > 0

        # features receive gradient through the net
        def loss(params):
            m = model._replace(params=params)
            o = sk_gs.sk_stage(cfg, m, m.params['xyz'], jnp.asarray(0.3),
                               time_id=1)
            return jnp.sum(jnp.square(o.aux['cache_row']))

        g = jax.grad(loss)(model.params)
        assert float(jnp.abs(g['sk_feature']).sum()) > 0

    @pytest.mark.integration
    def test_sk_feature_distill_and_init(self, rng):
        dim = 2
        cfg = small_cfg()._replace(
            sk_feature_dim=dim, which_rotation='lie',
            sk_net=SkeletonNetConfig(out_dims=(3, 4, 3), width=32, depth=2,
                                     skips=(1,), p_in_channels=3 + dim))
        model = self._model(rng, cfg)
        model2 = sk_gs_ops.init_skeleton(cfg, model, jax.random.PRNGKey(3),
                                         joint_steps=5, distill_steps=5)
        assert jnp.isfinite(model2.params['joints']).all()
        assert jnp.isfinite(model2.params['sk_feature']).all()
