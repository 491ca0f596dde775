"""Multi-chip training parity: the production SKGSTrainer step on a
('view', 'gs') mesh must reproduce the single-chip update exactly (grads
reassemble through the slice transpose + psum; losses via 1/n_gs scaling).

Runs the staged mini-schedule with BOTH trainers re-synced every step, so
each stage family (init/sp/sk_init/sk) is checked as one-step parity from
identical state — the multi-chip analogue of the reference's
check_C_runtime dual-path strategy (SURVEY §4).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sk_gs_tpu.data.synthetic import make_synthetic_scene
from sk_gs_tpu.framework.trainer import SKGSTrainer
from sk_gs_tpu.models import sk_gs
from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
from sk_gs_tpu.render import RasterConfig

from tests.test_trainer_e2e import tiny_cfg

pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def synthetic64():
    return make_synthetic_scene(seed=0, num_links=2, gauss_per_link=60,
                                num_frames=8, h=64, w=64,
                                pair_capacity=2 ** 13, chunk=64)


def _build(synthetic, mesh, batch_views):
    scene, meta, gt = synthetic
    cfg = tiny_cfg(meta.num_frames)
    rcfg = RasterConfig(image_width=64, image_height=64, sh_degree=1,
                        pair_capacity=2 ** 13, chunk=64, use_pallas=False)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, size=(200, 3)).astype(np.float32)
    cols = rng.uniform(size=(200, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, cfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), cfg, base,
                             np.asarray(meta.train_times))
    # SGD: the update is proportional to the gradient, so post-step param
    # parity IS gradient parity. (Adam's g/sqrt(v) amplifies float
    # reassociation noise to +-lr on knife-edge elements.)
    return SKGSTrainer(cfg, rcfg, scene, meta, model, pcd=(pts, cols),
                       gs_knn_num=5, gs_knn_update_interval=(10, 70),
                       batch_views=batch_views, mesh=mesh, optimizer='sgd')


def _sync(dst, src):
    """Copy the full trainer state. model/opt buffers must be DEEP copies:
    the jitted step donates them, so sharing would let src's next step
    delete dst's arrays."""
    for f in dataclasses.fields(src.state):
        v = getattr(src.state, f.name)
        if f.name in ('model', 'opt_state'):
            v = jax.tree.map(jnp.array, v)
        setattr(dst.state, f.name, v)


class TestParallelParity:
    def test_step_parity_across_stages(self, synthetic64):
        devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
        mesh = Mesh(devs, ('view', 'gs'))
        ta = _build(synthetic64, None, batch_views=2)
        tb = _build(synthetic64, mesh, batch_views=2)

        families_checked = set()
        # 1..56 crosses init_fix(5) init(15) sp_fix(5) sp(20) sk_init(5)
        # then 6 steps of sk — including the sp->sk transition at the
        # boundary (joint discovery + kinematic distill) and the skeleton
        # FK step family under the mesh.
        for step in range(1, 57):
            _sync(tb, ta)
            ma = ta.train_step(step)
            mb = tb.train_step(step)
            stage = ta.cfg.stage_at(step)
            # loss parity
            la, lb = float(ma['loss']), float(mb['loss'])
            assert np.isfinite(la) and np.isfinite(lb)
            np.testing.assert_allclose(lb, la, rtol=2e-3, atol=1e-5,
                                       err_msg=f'step {step} stage {stage}')
            # parameter parity after the update
            pa = ta.state.model.params
            pb = tb.state.model.params
            for name in pa:
                fa = jax.tree.leaves(pa[name])
                fb = jax.tree.leaves(pb[name])
                for xa, xb in zip(fa, fb):
                    xa, xb = np.asarray(xa), np.asarray(xb)
                    scale = np.abs(xa).max() + 1e-6
                    np.testing.assert_allclose(
                        xb / scale, xa / scale, atol=5e-4,
                        err_msg=f'step {step} stage {stage} param {name}')
            # densify stats parity (drive adaptive control)
            np.testing.assert_allclose(
                np.asarray(tb.state.model.denom),
                np.asarray(ta.state.model.denom), atol=1e-5,
                err_msg=f'step {step} denom')
            families_checked.add(stage)
            # keep tb's post-step state as ground truth for the next step
            # (ta re-syncs nothing: both advanced from identical state)
        assert {'init_fix', 'init', 'sp_fix', 'sp', 'sk_init', 'sk'} <= \
            families_checked
