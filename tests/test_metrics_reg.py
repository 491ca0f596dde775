"""Metrics (MS-SSIM) + motion regularizers tests, plus native MST parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.framework.metrics import MetricManager, ms_ssim
from sk_gs_tpu.models import regularizers as reg
from sk_gs_tpu.models import skeleton
from sk_gs_tpu.ops import se3


class TestMSSSIM:
    def test_identical_images(self, rng):
        img = jnp.asarray(rng.uniform(size=(96, 96, 3)).astype(np.float32))
        v = float(ms_ssim(img, img, levels=3))
        assert v > 0.999

    def test_degrades_with_noise(self, rng):
        img = jnp.asarray(rng.uniform(size=(96, 96, 3)).astype(np.float32))
        noisy = jnp.clip(img + 0.3 * jnp.asarray(
            rng.normal(size=(96, 96, 3)).astype(np.float32)), 0, 1)
        assert float(ms_ssim(img, noisy, levels=3)) < 0.9

    def test_manager_best_tracking(self, rng):
        m = MetricManager()
        img = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        m.update(img, img)
        out = m.summarize()
        assert out['is_best'] == 1.0
        assert out['PSNR'] > 50
        m.reset()
        m.update(img, jnp.clip(img + 0.2, 0, 1))
        out2 = m.summarize()
        assert out2['is_best'] == 0.0  # worse than perfect


class TestRegularizers:
    def test_arap_zero_for_rigid_motion(self, rng):
        m = 32
        pts = rng.normal(size=(m, 3)).astype(np.float32)
        T = se3.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.4, 0.2, -0.3]))
        seq = jnp.stack([jnp.asarray(pts), se3.se3_act(T[None], jnp.asarray(pts))])
        nn_idx, w, keep = reg.arap_connectivity(jnp.asarray(pts),
                                                jnp.ones(m, bool), k=6,
                                                radius=10.0)
        err_rigid = float(reg.arap_error(seq, nn_idx, w))
        # non-rigid: random offsets
        seq_bad = seq.at[1].add(jnp.asarray(
            rng.normal(size=(m, 3)).astype(np.float32) * 0.3))
        err_bad = float(reg.arap_error(seq_bad, nn_idx, w))
        assert err_rigid < 1e-4
        assert err_bad > err_rigid + 1e-2

    def test_elastic_zero_for_static(self, rng):
        m, t = 16, 5
        pts = rng.normal(size=(m, 3)).astype(np.float32)
        nodes_t = jnp.tile(jnp.asarray(pts)[:, None], (1, t, 1))
        nn_idx = jnp.asarray(rng.integers(0, m, (m, 3)))
        nn_w = jnp.full((m, 3), 1 / 3)
        assert float(reg.elastic_loss(nodes_t, nn_idx, nn_w)) < 1e-6

    def test_acc_zero_for_linear_motion(self, rng):
        m = 16
        p0 = rng.normal(size=(m, 3)).astype(np.float32)
        v = rng.normal(size=(m, 3)).astype(np.float32)
        nodes = jnp.stack([jnp.asarray(p0 - v), jnp.asarray(p0),
                           jnp.asarray(p0 + v)], axis=1)
        # safe-norm floor (1e-6) over the 1e-5 self-normalizer leaves ~0.09
        # at exactly-zero acceleration; accelerating motion sits near 1.0
        assert float(reg.acc_loss(nodes, jnp.ones(m))) < 0.15
        nodes_acc = nodes.at[:, 2].add(jnp.asarray(
            rng.normal(size=(m, 3)).astype(np.float32)))
        assert float(reg.acc_loss(nodes_acc, jnp.ones(m))) > 0.5

    def test_points_arap(self, rng):
        n = 32
        pc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        nn = jnp.asarray(rng.integers(0, n, (n, 4)))
        assert float(reg.points_arap_loss(pc, pc, nn, jnp.ones(n))) == 0.0
        pt = pc * 1.5  # scaled -> distances change
        assert float(reg.points_arap_loss(pc, pt, nn, jnp.ones(n))) > 0


class TestNativeMST:
    def test_native_matches_numpy(self, rng):
        m = 24
        cost = rng.uniform(1, 5, (m, m)).astype(np.float32)
        cost = (cost + cost.T) / 2
        alive = np.ones(m, bool)
        alive[-4:] = False
        p_native = skeleton.joint_discovery_host(cost, alive, use_native=True)
        p_numpy = skeleton.joint_discovery_host(cost, alive, use_native=False)
        # same tree topology (same root and same direct parents)
        np.testing.assert_array_equal(p_native[0][:, 0], p_numpy[0][:, 0])
        np.testing.assert_array_equal(p_native[1], p_numpy[1])
        assert p_native[2] == p_numpy[2]

    def test_native_builds(self):
        from sk_gs_tpu.native import joint_discovery_native
        cost = np.random.default_rng(0).uniform(1, 2, (8, 8)).astype(np.float32)
        out = joint_discovery_native(cost, np.ones(8, bool), 10)
        assert out is not None, "native library failed to build/load"
        parents, depth, root = out
        assert parents.shape == (8, 10)
        assert 0 <= root < 8
