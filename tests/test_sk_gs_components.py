"""Unit tests for superpoint LBS, forward kinematics, joint discovery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.models import skeleton, superpoints
from sk_gs_tpu.ops import quaternion as quat
from sk_gs_tpu.ops import se3


class TestLBS:
    def test_rigid_motion_is_reproduced(self, rng):
        # all superpoints share one rigid transform -> every point follows it
        m, n = 16, 200
        sp = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        T = se3.se3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.1, 0.2, -0.3]))
        spT = jnp.tile(T[None], (m, 1))
        w, idx = superpoints.calc_lbs_weight(
            pts, sp, jnp.ones(m, bool), 4, 'dist')
        d = superpoints.warp_points(pts, spT, w, idx, 'LBS')
        ref = se3.se3_act(T[None], pts) - pts
        np.testing.assert_allclose(np.asarray(d), np.asarray(ref), atol=1e-5)

    def test_weights_masked_dead_superpoints(self, rng):
        m, n = 8, 50
        sp = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        alive = jnp.asarray([True, True, True, False, False, False, False, False])
        w, idx = superpoints.calc_lbs_weight(pts, sp, alive, 3, 'dist')
        assert np.asarray(idx).max() <= 2
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)

    def test_W_method_softmax(self, rng):
        m, n = 8, 20
        sp = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        sp_W = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
        w, idx = superpoints.calc_lbs_weight(
            pts, sp, jnp.ones(m, bool), 3, 'W', sp_W=sp_W)
        # manual: softmax over gathered W at the same knn indices
        ref = jax.nn.softmax(jnp.take_along_axis(sp_W, idx, axis=1), axis=-1)
        np.testing.assert_allclose(np.asarray(w), np.asarray(ref), atol=1e-6)

    def test_lbs_c_recenters_rotation(self, rng):
        # LBS_c: pure rotation about the superpoint itself keeps it fixed
        m = 4
        sp = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        d_rot = quat.normalize(jnp.asarray(rng.normal(size=(m, 4)).astype(np.float32)))
        spT = superpoints.sp_transforms(jnp.zeros((m, 3)), d_rot, sp, 'LBS_c')
        moved = se3.se3_act(spT, sp)
        np.testing.assert_allclose(np.asarray(moved), np.asarray(sp), atol=1e-5)


class TestFK:
    def test_chain_composition(self):
        # chain 0 <- 1 <- 2 (root=0), local translations along x
        m = 3
        local = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (m, 1))
        local[1, 0] = 1.0  # joint1: translate +x
        local[2, 0] = 1.0  # joint2: translate +x
        parents = np.zeros((m, skeleton.MAX_LEVELS), np.int32)
        parents[1, 0] = 0
        parents[2, 0] = 1
        for lv in range(1, skeleton.MAX_LEVELS):
            parents[:, lv] = parents[parents[:, lv - 1], lv - 1]
        out = skeleton.skeleton_fk(jnp.asarray(local), None,
                                   jnp.asarray(parents), jnp.asarray(0))
        out = np.asarray(out)
        # root has identity; joint1 = its own local; joint2 = parent1*local2
        np.testing.assert_allclose(out[0, :3], 0, atol=1e-6)
        np.testing.assert_allclose(out[1, :3], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[2, :3], [2, 0, 0], atol=1e-6)

    def test_rotation_chain(self):
        # joint1 rotates 90deg about z at origin; joint2 translated (1,0,0)
        m = 2
        q = np.asarray(quat.from_axis_angle(jnp.asarray([0.0, 0, 1]), jnp.pi / 2))
        local = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (m, 1))
        local[1, 3:] = q
        parents = np.zeros((m, skeleton.MAX_LEVELS), np.int32)
        parents[1, 0] = 0
        out = skeleton.skeleton_fk(jnp.asarray(local), None,
                                   jnp.asarray(parents), jnp.asarray(0))
        p = se3.se3_act(out[1], jnp.asarray([1.0, 0, 0]))
        np.testing.assert_allclose(np.asarray(p), [0, 1, 0], atol=1e-5)

    def test_global_transform_applied(self):
        m = 2
        local = jnp.tile(jnp.asarray([[0, 0, 0, 0, 0, 0, 1.0]]), (m, 1))
        parents = jnp.zeros((m, skeleton.MAX_LEVELS), jnp.int32)
        g = se3.se3_exp(jnp.asarray([1.0, 2, 3, 0, 0, 0]))
        out = skeleton.skeleton_fk(local, g, parents, jnp.asarray(0))
        np.testing.assert_allclose(np.asarray(out[:, :3]), [[1, 2, 3]] * 2, atol=1e-5)


class TestJointDiscovery:
    def test_mst_on_simple_graph(self):
        # 4 nodes in a line: cost favors 0-1, 1-2, 2-3
        m = 4
        cost = np.full((m, m), 10.0)
        for a, b, c in [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]:
            cost[a, b] = cost[b, a] = c
        parents, depth, root = skeleton.joint_discovery_host(
            cost, np.ones(m, bool))
        # tree must be the path graph; root should be a middle node
        assert root in (1, 2)
        assert depth.max() == 2
        # parents consistency: following parents reaches root
        for i in range(m):
            j, steps = i, 0
            while j != root and steps < 10:
                j = parents[j, 0]
                steps += 1
            assert j == root

    def test_mst_respects_alive_mask(self):
        m = 6
        cost = np.random.default_rng(0).uniform(1, 2, (m, m))
        cost = (cost + cost.T) / 2
        alive = np.array([True, True, True, True, False, False])
        parents, depth, root = skeleton.joint_discovery_host(cost, alive)
        assert alive[root]
        assert (parents[~alive, 0] == root).all()
        assert (depth[~alive] == 0).all()

    def test_update_joint(self, rng):
        m = 8
        cost = jnp.asarray(rng.uniform(1, 2, (m, m)).astype(np.float32))
        sp = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        parents, depth, root = skeleton.update_joint(
            cost, sp, jnp.ones(m, bool), 3)
        assert parents.shape == (m, skeleton.MAX_LEVELS)
        assert 0 <= int(root) < m

    def test_joint_cost_zero_for_rigid(self, rng):
        # identical transforms + symmetric pivots (the reference's midpoint
        # init, sk_gs.py:865) -> both cost terms vanish
        m = 5
        T = se3.se3_exp(jnp.asarray([0.1, 0.2, 0.3, 0.3, -0.2, 0.1]))
        spT = jnp.tile(T[None], (m, 1))
        p = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        jp = 0.5 * (p[:, None] + p[None, :])
        cost = skeleton.joint_cost_matrix(jp, spT, jnp.ones(m, bool))
        np.testing.assert_allclose(np.asarray(cost), 0.0, atol=1e-5)

    def test_joint_cost_detects_articulation(self, rng):
        # two parts rotating about a shared pivot: correct pivot -> low cost
        m = 2
        pivot = jnp.asarray([1.0, 0.0, 0.0])
        Ta = se3.se3_identity(())
        # part b rotates 30deg about z around the pivot
        q = quat.from_axis_angle(jnp.asarray([0.0, 0, 1]), jnp.pi / 6)
        tb = pivot + quat.apply(q, -pivot)
        Tb = jnp.concatenate([tb, q])
        spT = jnp.stack([Ta, Tb])
        jp_good = jnp.tile(pivot[None, None], (m, m, 1))
        cost_good = skeleton.joint_cost_matrix(jp_good, spT, jnp.ones(m, bool))
        jp_bad = jnp.tile(jnp.asarray([[-3.0, 2, 1]])[None], (m, m, 1))
        cost_bad = skeleton.joint_cost_matrix(jp_bad, spT, jnp.ones(m, bool))
        assert float(cost_good[0, 1]) < float(cost_bad[0, 1]) - 0.1


class TestSuperpointAdjust:
    def test_prune_split_masks(self, rng):
        m, n, k = 16, 100, 4
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        w = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, k)).astype(np.float32)), -1)
        idx = jnp.asarray(rng.integers(0, 8, size=(n, k)))  # only sp 0..7 used
        alive = jnp.ones(m, bool)
        prune, split, new_pos = superpoints.superpoint_prune_split_masks(
            w, idx, alive, jnp.zeros(n), jnp.zeros(n), pts,
            prune_threshold=1e-3, split_threshold=1e9, m_cap=m)
        # superpoints 8..15 receive no weight -> pruned
        assert np.asarray(prune)[8:].all()
        assert not np.asarray(prune)[:8].any()

    def test_merge_candidates(self, rng):
        m, T = 8, 5
        sp = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        cache = jnp.asarray(rng.normal(size=(T, m, 10)).astype(np.float32))
        # make sp 0 and 1 identical in motion and position
        sp = sp.at[1].set(sp[0] + 1e-4)
        cache = cache.at[:, 1].set(cache[:, 0])
        min_diff, min_index = superpoints.superpoint_merge_masks(
            sp, jnp.ones(m, bool), cache, 3, 0.01)
        assert int(min_index[0]) == 1 or int(min_index[1]) == 0
        assert float(min_diff[0]) < 1e-5 or float(min_diff[1]) < 1e-5


class TestMixedPrecision:
    """compute_dtype='bfloat16' (the reference --fp16 AMP analogue,
    my_ext/framework.py:264-306): nets compute in bf16, return f32, stay
    close to the f32 path, and train with finite grads."""

    @pytest.mark.integration
    def test_deform_net_bf16_close_and_f32_out(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from sk_gs_tpu.models.deform import (DeformNetConfig,
                                             deform_net_apply,
                                             deform_net_init)
        cfg = DeformNetConfig(depth=2, width=64, is_blender=True)
        params = deform_net_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (50, 3))
        t = jnp.asarray(0.3)
        out32 = deform_net_apply(params, cfg, x, t)
        cfg16 = cfg._replace(compute_dtype='bfloat16')
        out16 = deform_net_apply(params, cfg16, x, t)
        assert out16['d_xyz'].dtype == jnp.float32
        scale = float(jnp.abs(out32['hidden']).max()) + 1e-6
        err = float(jnp.abs(out16['hidden'] - out32['hidden']).max()) / scale
        assert err < 0.05, err
        # grads flow (f32 cotangents through the casts) and are finite
        g = jax.grad(lambda p: jnp.sum(
            deform_net_apply(p, cfg16, x, t)['d_xyz'] ** 2))(params)
        leaves = jax.tree.leaves(g)
        assert all(l.dtype == jnp.float32 for l in leaves)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_skeleton_net_bf16(self):
        import jax
        import jax.numpy as jnp
        from sk_gs_tpu.models.deform import (SkeletonNetConfig,
                                             skeleton_net_apply,
                                             skeleton_net_init)
        cfg = SkeletonNetConfig(out_dims=(4, 4, 3), width=32, depth=2,
                                skips=(1,))
        params = skeleton_net_init(jax.random.PRNGKey(0), cfg)
        joints = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
        outs = skeleton_net_apply(params, cfg._replace(
            compute_dtype='bfloat16'), joints, jnp.asarray(0.5))
        assert all(o.dtype == jnp.float32 for o in outs)
