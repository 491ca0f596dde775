"""Equivalence tests for the scatter/gather-free TPU paths.

These pin the round-2 perf rewrites to their reference semantics:
- masked_knn k-argmin selection == lax.top_k selection (incl. ties)
- dense-rows LBS (MXU matmul) == sparse gather blend
- select_rows == take_along_axis (exact)
- smooth_loss_fast sorted-segment backward == plain autodiff backward
- sorted grad_reduce == scatter segment_sum
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.models import superpoints as sp
from sk_gs_tpu.framework.trainer import smooth_loss_fast, weight_smooth_loss


def ref_topk_knn(q, kp, mask, k):
    d2 = jnp.sum(jnp.square(q[:, None, :] - kp[None, :, :]), axis=-1)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


class TestMaskedKnn:
    def test_matches_topk(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(300, 5)).astype(np.float32))
        kp = jnp.asarray(rng.normal(size=(64, 5)).astype(np.float32))
        mask = jnp.asarray(rng.random(64) > 0.3)
        d1, i1 = sp.masked_knn(q, kp, mask, 7)
        d2, i2 = ref_topk_knn(q, kp, mask, 7)
        assert np.array_equal(np.asarray(d1), np.asarray(d2))
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_tie_break_and_all_dead(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        kp0 = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        kp = jnp.concatenate([kp0] * 8, axis=0)       # ties everywhere
        _, i1 = sp.masked_knn(q, kp, jnp.ones(64, bool), 5)
        _, i2 = ref_topk_knn(q, kp, jnp.ones(64, bool), 5)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        d1, i1 = sp.masked_knn(q, kp, jnp.zeros(64, bool), 3)
        _, i2 = ref_topk_knn(q, kp, jnp.zeros(64, bool), 3)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        assert np.all(np.isinf(np.asarray(d1)))

    def test_grad_through_features(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(100, 4)).astype(np.float32))
        kp = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        mask = jnp.ones(16, bool)

        def f(fn, q):
            d, _ = fn(q, kp, mask, 4)
            return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

        g1 = jax.grad(lambda x: f(sp.masked_knn, x))(q)
        g2 = jax.grad(lambda x: f(ref_topk_knn, x))(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


class TestDenseLBS:
    def _setup(self, seed=0, n=400, m=24, k=5):
        rng = np.random.default_rng(seed)
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        t = rng.normal(size=(m, 3)).astype(np.float32)
        q = rng.normal(size=(m, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        spT = jnp.asarray(np.concatenate([t, q], 1))
        rot = jnp.asarray(rng.normal(size=(m, 4)).astype(np.float32))
        scl = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        w = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(n, k)).astype(np.float32)), -1)
        idx = jnp.asarray(np.stack(
            [rng.choice(m, k, replace=False) for _ in range(n)]
        ).astype(np.int32))
        return pts, spT, rot, scl, w, idx

    def test_forward_matches_sparse(self):
        pts, spT, rot, scl, w, idx = self._setup()
        d1 = sp.warp_points(pts, spT, w, idx, 'LBS')
        r1 = sp.blend_attr(rot, w, idx)
        s1 = sp.blend_attr(scl, w, idx)
        W = sp.dense_lbs_rows(w, idx, spT.shape[0])
        d2, r2, s2 = sp.warp_blend_dense(pts, spT, W, rot, scl)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=3e-5)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=3e-6)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=3e-6)

    def test_grads_match_sparse(self):
        # incl. OFF-UNIT quaternions: to_matrix(pre_normalize=False) is the
        # exact linear map of quat.apply for arbitrary q, so values and
        # Jacobians must agree even off the unit sphere (global_tr is a raw
        # trained param).
        pts, spT0, rot, scl, w, idx = self._setup(seed=3)
        spT0 = spT0.at[:, 3:7].multiply(1.1)   # push quats off-unit

        def f_sparse(w, rot, spT):
            return (jnp.sum(sp.warp_points(pts, spT, w, idx, 'LBS') ** 2)
                    + jnp.sum(sp.blend_attr(rot, w, idx) ** 2))

        def f_dense(w, rot, spT):
            W = sp.dense_lbs_rows(w, idx, spT.shape[0])
            d, r, _ = sp.warp_blend_dense(pts, spT, W, rot, scl)
            return jnp.sum(d ** 2) + jnp.sum(r ** 2)

        g1 = jax.grad(f_sparse, argnums=(0, 1, 2))(w, rot, spT0)
        g2 = jax.grad(f_dense, argnums=(0, 1, 2))(w, rot, spT0)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=5e-4)

    def test_empty_attr_tables(self):
        pts, spT, rot, scl, w, idx = self._setup(seed=4)
        W = sp.dense_lbs_rows(w, idx, spT.shape[0])
        empty = jnp.zeros((spT.shape[0], 0), pts.dtype)
        d, r, s = sp.warp_blend_dense(pts, spT, W, empty, empty)
        d_ref = sp.warp_points(pts, spT, w, idx, 'LBS')
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                                   atol=3e-5)
        assert r.shape == (pts.shape[0], 0)

    def test_select_rows_exact(self):
        rng = np.random.default_rng(5)
        table = jnp.asarray(rng.normal(size=(200, 40)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 40, size=(200, 6)).astype(np.int32))
        a = jnp.take_along_axis(table, idx, axis=1)
        b = sp.select_rows(table, idx)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_select_rows_grad_exact(self):
        rng = np.random.default_rng(6)
        table = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 16, size=(50, 4)).astype(np.int32))
        g1 = jax.grad(lambda t: jnp.sum(
            jnp.take_along_axis(t, idx, axis=1) ** 2))(table)
        g2 = jax.grad(lambda t: jnp.sum(sp.select_rows(t, idx) ** 2))(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


class TestSmoothLossFast:
    def test_value_and_grad_match(self):
        rng = np.random.default_rng(7)
        n, j, k = 300, 8, 5
        w = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
        knn = jnp.asarray(rng.integers(0, n, size=(n, j)).astype(np.int32))
        flat = np.asarray(knn).reshape(-1)
        perm = jnp.asarray(np.argsort(flat, kind='stable').astype(np.int32))
        sorted_ids = jnp.asarray(flat[np.asarray(perm)])
        mask = jnp.asarray(rng.uniform(size=n) > 0.3)  # alive subset
        ref = lambda w: jnp.sum(
            jnp.abs(w[:, None] - w[knn]) * mask[:, None, None]) \
            / (jnp.sum(mask) * j * k)
        l1 = ref(w)
        l2 = smooth_loss_fast(w, knn, perm, sorted_ids, mask)
        assert np.allclose(float(l1), float(l2), rtol=1e-6)
        g1 = jax.grad(ref)(w)
        g2 = jax.grad(lambda w: smooth_loss_fast(w, knn, perm, sorted_ids,
                                                 mask))(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
        # all-alive mask reduces to the plain mean
        ones = jnp.ones(n, bool)
        l3 = smooth_loss_fast(w, knn, perm, sorted_ids, ones)
        assert np.allclose(float(l3), float(weight_smooth_loss(w, knn)),
                           rtol=1e-6)


class TestSortedGradReduce:
    def test_matches_scatter(self):
        from sk_gs_tpu.render import tile_kernel as tk
        rng = np.random.default_rng(8)
        K, N = 2048, 100
        ids = jnp.asarray(rng.integers(0, N, size=K).astype(np.int32))
        g = jnp.asarray(rng.normal(size=(K, 9)).astype(np.float32))
        a = jax.ops.segment_sum(g, ids, num_segments=N)
        ids_sorted, perm = jax.lax.sort(
            (ids, jnp.arange(K, dtype=jnp.int32)), num_keys=1)
        b = jax.ops.segment_sum(g[perm], ids_sorted, num_segments=N,
                                indices_are_sorted=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        assert tk.IMPL['grad_reduce'] in ('scatter', 'sorted', 'auto')
