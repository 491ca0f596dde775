"""Math-core tests: quaternion/SE3 round-trips and cross-checks against
scipy + torch references (mirroring the reference's inline test pattern,
e.g. /root/reference/my_ext/ops_3d/quaternion.py:208-250)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sk_gs_tpu.ops import quaternion as quat
from sk_gs_tpu.ops import se3
from sk_gs_tpu.ops import sh
from sk_gs_tpu.ops import knn as knn_ops
from sk_gs_tpu.ops import mlp as mlp_ops
from sk_gs_tpu.ops.encoders import FreqEncoder
from sk_gs_tpu.ops import transforms as tf


def rand_quat(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_to_matrix_matches_scipy(self, rng):
        # scipy uses the same (x, y, z, w) layout
        q = rand_quat(rng, 64)
        R_ref = Rotation.from_quat(q).as_matrix()
        R = np.asarray(quat.to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_from_matrix_roundtrip(self, rng):
        q = rand_quat(rng, 128)
        R = quat.to_matrix(jnp.asarray(q))
        q2 = np.asarray(quat.from_matrix(R))
        # sign-ambiguous: compare rotations
        np.testing.assert_allclose(
            Rotation.from_quat(q2).as_matrix(), np.asarray(R), atol=1e-5)

    def test_multiply_matches_matrix_product(self, rng):
        q1, q2 = jnp.asarray(rand_quat(rng, 16)), jnp.asarray(rand_quat(rng, 16))
        R12 = quat.to_matrix(quat.multiply(q1, q2))
        np.testing.assert_allclose(
            np.asarray(R12), np.asarray(quat.to_matrix(q1) @ quat.to_matrix(q2)), atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        q = jnp.asarray(rand_quat(rng, 32))
        v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
        out = quat.apply(q, v)
        ref = jnp.einsum('nij,nj->ni', quat.to_matrix(q), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_identity_and_inverse(self, rng):
        q = jnp.asarray(rand_quat(rng, 8))
        e = quat.multiply(q, quat.inverse(q))
        np.testing.assert_allclose(np.asarray(e), np.asarray(quat.identity((8,))), atol=1e-6)

    def test_axis_angle_roundtrip(self, rng):
        axis = rng.normal(size=(16, 3)).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        angle = rng.uniform(0.1, 3.0, size=(16,)).astype(np.float32)
        q = quat.from_axis_angle(jnp.asarray(axis), jnp.asarray(angle))
        a2, ang2 = quat.to_axis_angle(q)
        np.testing.assert_allclose(np.asarray(a2), axis, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ang2), angle, atol=1e-5)


class TestSE3:
    def test_grads_finite_at_identity(self):
        """Backward through so3_log / se3_log / normalize at the EXACT
        identity must be finite: jnp.linalg.norm's grad is 0/0 there.

        Regression for the round-4 sk-distill collapse — TPU flush-to-zero
        produced an exactly-identity relative transform inside cmp_t and one
        NaN gradient poisoned joints/global_tr/sk_deform for the entire sk
        stage (CPU f32 never hits the exact zero)."""
        q_id = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        for fn in (lambda q: jnp.sum(se3.so3_log(q)),
                   lambda q: jnp.sum(quat.normalize(q)),
                   lambda q: jnp.sum(quat.to_axis_angle(q)[1])):
            g = jax.grad(fn)(q_id)
            assert np.all(np.isfinite(np.asarray(g))), fn
        T_id = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
        g = jax.grad(lambda T: jnp.sum(se3.se3_log(T)))(T_id)
        assert np.all(np.isfinite(np.asarray(g)))
        # and the composed form the distill loss uses: log(inv(T) * T)
        g = jax.grad(lambda T: jnp.sum(jnp.square(
            se3.se3_log(se3.se3_mul(se3.se3_inv(T), T)))))(
                jnp.asarray([0.1, -0.2, 0.3, 0.1, 0.2, -0.1, 0.95]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_so3_exp_log_roundtrip(self, rng):
        # log returns the principal branch, so keep |phi| < pi
        phi = rng.normal(size=(64, 3)).astype(np.float32)
        phi *= (rng.uniform(0.01, 3.0, size=(64, 1)).astype(np.float32)
                / np.linalg.norm(phi, axis=-1, keepdims=True))
        q = se3.so3_exp(jnp.asarray(phi))
        phi2 = np.asarray(se3.so3_log(q))
        np.testing.assert_allclose(phi2, phi, atol=1e-4)

    def test_so3_exp_matches_scipy(self, rng):
        phi = rng.normal(size=(32, 3)).astype(np.float32)
        q = np.asarray(se3.so3_exp(jnp.asarray(phi)))
        q_ref = Rotation.from_rotvec(phi).as_quat()  # (x,y,z,w)
        # sign ambiguity
        sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(q * sign, q_ref, atol=1e-5)

    def test_se3_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 6)).astype(np.float32)
        # keep the rotation part on the principal branch
        xi[:, 3:] *= (rng.uniform(0.01, 3.0, size=(64, 1)).astype(np.float32)
                      / np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True))
        T = se3.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(se3.se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_se3_mul_inv_act(self, rng):
        xi = rng.normal(size=(16, 6)).astype(np.float32)
        T = se3.se3_exp(jnp.asarray(xi))
        Tinv = se3.se3_inv(T)
        e = se3.se3_mul(T, Tinv)
        np.testing.assert_allclose(np.asarray(e), np.asarray(se3.se3_identity((16,))), atol=1e-5)

        p = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        # act == matrix transform
        M = se3.se3_matrix(T)
        ref = jnp.einsum('nij,nj->ni', M[:, :3, :3], p) + M[:, :3, 3]
        np.testing.assert_allclose(np.asarray(se3.se3_act(T, p)), np.asarray(ref), atol=1e-5)

    def test_se3_matrix_roundtrip(self, rng):
        xi = rng.normal(size=(16, 6)).astype(np.float32)
        T = se3.se3_exp(jnp.asarray(xi))
        T2 = se3.se3_from_matrix(se3.se3_matrix(T))
        p = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(se3.se3_act(T2, p)), np.asarray(se3.se3_act(T, p)), atol=1e-5)

    def test_small_angle_stability(self):
        phi = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        q = se3.so3_exp(phi)
        assert np.all(np.isfinite(np.asarray(q)))
        g = jax.grad(lambda p: jnp.sum(se3.so3_exp(p)))(phi)
        assert np.all(np.isfinite(np.asarray(g)))
        xi = jnp.zeros((2, 6))
        g2 = jax.grad(lambda p: jnp.sum(se3.se3_exp(p)))(xi)
        assert np.all(np.isfinite(np.asarray(g2)))


class TestSH:
    def test_deg0_constant(self, rng):
        coeffs = jnp.asarray(rng.normal(size=(4, 1, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        out = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(coeffs[:, 0]) * sh.C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(size=(8, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6)

    def test_band_energy_orthogonality(self, rng):
        # integrating |Y_lm|^2 over the sphere ~ 1 for each basis (MC check)
        n = 200_000
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        for deg in (1, 2, 3):
            nb = sh.num_sh_bases(deg)
            for b in range(nb):
                coeffs = np.zeros((1, nb, 1), np.float32)
                coeffs[0, b, 0] = 1.0
                vals = np.asarray(sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(d)))
                integral = 4 * np.pi * np.mean(vals ** 2)
                np.testing.assert_allclose(integral, 1.0, rtol=0.05)

    def test_degree_mask(self):
        m = np.asarray(sh.sh_degree_mask(3, jnp.asarray(1)))
        assert m.tolist() == [1, 1, 1, 1] + [0] * 12


class TestTransforms:
    def test_convert_opengl_to_opencv_roundtrip(self, rng):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.random(random_state=0).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        T = jnp.asarray(T)
        T2 = tf.convert_coord_system(T, 'opengl', 'colmap')
        T3 = tf.convert_coord_system(T2, 'colmap', 'opengl')
        np.testing.assert_allclose(np.asarray(T3), np.asarray(T), atol=1e-6)

    def test_fov_focal_roundtrip(self):
        fov = 0.8
        f = tf.fov_to_focal(fov, 800)
        np.testing.assert_allclose(tf.focal_to_fov(f, 800), fov, atol=1e-6)

    def test_perspective_opencv_projects_forward_points(self):
        P = tf.perspective_opencv(jnp.asarray(0.8), size=(640, 480), n=0.1, f=100.0)
        p = jnp.asarray([0.0, 0.0, 5.0, 1.0])
        clip = P @ p
        ndc = clip[:3] / clip[3]
        assert abs(float(ndc[0])) < 1e-5 and abs(float(ndc[1])) < 1e-5
        assert 0.0 < float(ndc[2]) < 1.0 or float(ndc[2]) > 0  # inside depth range

    def test_lookat_opencv_center_projects_to_origin(self):
        eye = jnp.asarray([0.0, 0.0, -4.0])
        at = jnp.asarray([0.0, 0.0, 0.0])
        up = jnp.asarray([0.0, -1.0, 0.0])
        Tw2v = tf.look_at(eye, at, up, coord='opencv')
        pv = Tw2v[:3, :3] @ at + Tw2v[:3, 3]
        # camera looks down +z in opencv: the at-point is 4 in front
        np.testing.assert_allclose(np.asarray(pv), [0, 0, 4.0], atol=1e-5)


class TestKNN:
    def test_knn_matches_bruteforce(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        q = rng.normal(size=(100, 3)).astype(np.float32)
        d2, idx = knn_ops.knn(jnp.asarray(q), jnp.asarray(pts), 4, chunk=64)
        full = ((q[:, None] - pts[None]) ** 2).sum(-1)
        ref_idx = np.argsort(full, axis=-1)[:, :4]
        ref_d2 = np.take_along_axis(full, ref_idx, axis=-1)
        np.testing.assert_allclose(np.sort(np.asarray(d2)), np.sort(ref_d2), atol=1e-4)

    def test_fps_spreads_points(self, rng):
        pts = np.concatenate([
            rng.normal(size=(100, 3)).astype(np.float32),
            rng.normal(size=(100, 3)).astype(np.float32) + 100.0,
        ])
        idx = np.asarray(knn_ops.furthest_point_sampling(jnp.asarray(pts), 10))
        # both clusters must be sampled
        assert (idx < 100).any() and (idx >= 100).any()
        assert len(np.unique(idx)) == 10

    def test_fps_respects_mask(self, rng):
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[10:20] = True
        idx = np.asarray(knn_ops.furthest_point_sampling(
            jnp.asarray(pts), 5, jnp.asarray(mask)))
        assert ((idx >= 10) & (idx < 20)).all()

    def test_mean_knn_dist2(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        out = np.asarray(knn_ops.mean_knn_dist2(jnp.asarray(pts), k=3, chunk=64))
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(full, np.inf)
        ref = np.sort(full, axis=-1)[:, :3].mean(-1)
        np.testing.assert_allclose(out, ref, rtol=1e-4)


class TestMLPAndEncoders:
    def test_freq_encoder_dims_and_values(self):
        enc = FreqEncoder(input_dim=3, degree=4)
        assert enc.output_dim == 3 + 3 * 4 * 2
        x = jnp.asarray([[0.1, 0.2, 0.3]], dtype=jnp.float32)
        out = np.asarray(enc(x))
        assert out.shape == (1, enc.output_dim)
        np.testing.assert_allclose(out[0, :3], [0.1, 0.2, 0.3], atol=1e-6)
        np.testing.assert_allclose(out[0, 3:6], np.sin([0.1, 0.2, 0.3]), atol=1e-6)
        # last cos band: freq 8
        np.testing.assert_allclose(out[0, -3:], np.cos(np.array([0.1, 0.2, 0.3]) * 8), atol=1e-6)

    def test_mlp_skips_shapes(self):
        key = jax.random.PRNGKey(0)
        p = mlp_ops.mlp_init(key, 10, 32, 4, out_channels=[5, 4, 3], skips=(2,))
        x = jnp.ones((7, 10))
        outs = mlp_ops.mlp_apply(p, x, skips=(2,), multi_head=True)
        assert [o.shape for o in outs] == [(7, 5), (7, 4), (7, 3)]
        # skip layer consumes hidden+input features
        assert p['layers'][3]['w'].shape[0] == 32 + 10

    def test_mlp_single_head(self):
        key = jax.random.PRNGKey(1)
        p = mlp_ops.mlp_init(key, 8, 16, 3, out_channels=2)
        out = mlp_ops.mlp_apply(p, jnp.ones((5, 8)))
        assert out.shape == (5, 2)

    def test_head_reinit_small(self):
        key = jax.random.PRNGKey(2)
        p = mlp_ops.mlp_init(key, 8, 16, 2, out_channels=[4, 3])
        p2 = mlp_ops.mlp_head_reinit_small(p, key, std=1e-6, bias=[np.array([0, 0, 0, 1.0]), None])
        assert float(jnp.abs(p2['heads'][0]['w']).max()) < 1e-4
        np.testing.assert_allclose(np.asarray(p2['heads'][0]['b']), [0, 0, 0, 1.0])
        np.testing.assert_allclose(np.asarray(p2['heads'][1]['b']), 0.0)
