"""Viewer click-picking (parity: /root/reference/gui.py:333 routes a click
through GaussianRasterizer.topk_weights, gaussian_render.py:343-347):
render_topk over a known scene picks the dominant Gaussian's superpoint."""
import jax.numpy as jnp
import numpy as np
import pytest


def test_dominant_superpoint_aggregates_by_sp():
    from viewer import dominant_superpoint
    # two gaussians of sp 3 (weights .2+.25) beat one of sp 1 (weight .4)
    idx = np.array([7, 2, 5, -1], np.int32)
    w = np.array([0.4, 0.2, 0.25, 0.9], np.float32)  # -1 slot ignored
    p2sp = np.zeros(10, np.int64)
    p2sp[7] = 1
    p2sp[2] = p2sp[5] = 3
    sp, weight = dominant_superpoint(idx, w, p2sp, m=4)
    assert sp == 3
    assert weight == pytest.approx(0.45, abs=1e-6)


def test_dominant_superpoint_background():
    from viewer import dominant_superpoint
    idx = np.full(4, -1, np.int32)
    w = np.zeros(4, np.float32)
    assert dominant_superpoint(idx, w, np.zeros(5, np.int64), 3) == (-1, 0.0)


def test_render_topk_picks_front_gaussian():
    """A big opaque front Gaussian at center dominates the center pixel."""
    from test_render import CFG, make_view
    from sk_gs_tpu.render import render_topk
    from sk_gs_tpu.render.settings import GaussianInputs

    n = 6
    means = np.zeros((n, 3), np.float32)
    means[:, 2] = np.linspace(2.0, 4.0, n)  # id 0 nearest the camera
    means[1:, 0] = np.linspace(-0.5, 0.5, n - 1)
    g = GaussianInputs(
        means3d=jnp.asarray(means),
        scales=jnp.full((n, 3), 0.2),
        rotations=jnp.tile(jnp.asarray([[0.0, 0, 0, 1]]), (n, 1)),
        opacities=jnp.asarray([0.95] + [0.1] * (n - 1)),
        colors=jnp.ones((n, 3)))
    idx, w = render_topk(g, make_view(), CFG, k=3)
    assert idx.shape == (48, 64, 3)
    cy, cx = 24, 32
    assert int(idx[cy, cx, 0]) == 0
    assert float(w[cy, cx, 0]) > 0.5
    # the pick helper agrees when each gaussian is its own superpoint
    from viewer import dominant_superpoint
    sp, weight = dominant_superpoint(np.asarray(idx[cy, cx]),
                                     np.asarray(w[cy, cx]),
                                     np.arange(n), m=n)
    assert sp == 0
    assert weight > 0.5
