"""Capacity bucketing: resize correctness + trainer equivalence.

The padded-capacity design (SURVEY §7) makes every jitted step pay for the
full configured capacity; models/capacity.py compacts alive rows and
resizes the buffers to a population-tracking bucket. Dead rows contribute
nothing anywhere (masked losses, culled splats, no-op Adam rows), so a
resize must not change the training math beyond f32 reduction order.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sk_gs_tpu.data.synthetic import make_synthetic_scene
from sk_gs_tpu.framework.trainer import SKGSTrainer
from sk_gs_tpu.models import capacity as cap_mod
from sk_gs_tpu.models import optim, sk_gs
from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
from sk_gs_tpu.render import RasterConfig

from test_trainer_e2e import tiny_cfg


def test_next_bucket_policy():
    assert cap_mod.next_bucket(10, max_cap=100352) == 4096
    assert cap_mod.next_bucket(5000, max_cap=100352) == 8192
    assert cap_mod.next_bucket(90000, max_cap=100352) == 100352
    # mesh divisibility: multiple of 3*1024 when gs axis is 3
    assert cap_mod.next_bucket(10, multiple=3072, max_cap=99 * 1024) % 3072 == 0


def _tiny_model(cfg, n_cap=64, n_alive=20, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.5, 1.5, size=(n_alive, 3)).astype(np.float32)
    cols = rng.uniform(size=(n_alive, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, cfg.gauss._replace(capacity=n_cap))
    return sk_gs.init_model(jax.random.PRNGKey(seed), cfg, base,
                            np.asarray(np.linspace(0, 1, 8, dtype=np.float32)))


def test_resize_roundtrip_preserves_alive_rows():
    cfg = tiny_cfg(8)._replace(
        gauss=tiny_cfg(8).gauss._replace(capacity=64))
    model = _tiny_model(cfg)
    opt = optim.adam_init(model.params)
    # scatter some alive rows around and give moments distinct values
    rng = np.random.default_rng(1)
    alive = np.zeros(64, bool)
    alive[rng.choice(64, size=20, replace=False)] = True
    model = model._replace(alive=jnp.asarray(alive))
    mu = {k: (jnp.arange(v.size, dtype=jnp.float32).reshape(v.shape)
              if k in cap_mod.PER_POINT_PARAMS else v)
          for k, v in opt.mu.items()}
    opt = opt._replace(mu=mu)

    key_vals = {}
    order_ids = np.flatnonzero(alive)
    for k in cap_mod.PER_POINT_PARAMS:
        if k in model.params:
            key_vals[k] = np.asarray(model.params[k])[order_ids]

    m2, o2 = cap_mod.resize_model(model, opt, 32)   # shrink 64 -> 32
    assert m2.capacity == 32
    assert int(jnp.sum(m2.alive)) == 20
    # alive rows are the FIRST rows after compaction, original order kept
    for k, want in key_vals.items():
        np.testing.assert_array_equal(np.asarray(m2.params[k])[:20], want)
    np.testing.assert_array_equal(
        np.asarray(m2.opt_mu_probe if hasattr(m2, 'opt_mu_probe') else
                   o2.mu['xyz'])[:20],
        np.asarray(mu['xyz'])[order_ids])

    m3, o3 = cap_mod.resize_model(m2, o2, 48)       # grow 32 -> 48
    assert m3.capacity == 48
    assert int(jnp.sum(m3.alive)) == 20
    for k, want in key_vals.items():
        np.testing.assert_array_equal(np.asarray(m3.params[k])[:20], want)
    # grown rows are dead and zero-moment
    assert not np.any(np.asarray(m3.alive)[32:])
    assert not np.any(np.asarray(o3.mu['xyz'])[32:])


def _make_trainer(synthetic, cfg, n_cap, buckets=False):
    scene, meta, gt = synthetic
    rcfg = RasterConfig(image_width=48, image_height=48, sh_degree=1,
                        pair_capacity=2 ** 13, chunk=64, use_pallas=False)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, size=(120, 3)).astype(np.float32)
    cols = rng.uniform(size=(120, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, cfg.gauss._replace(capacity=n_cap))
    model = sk_gs.init_model(jax.random.PRNGKey(0), cfg, base,
                             np.asarray(meta.train_times))
    return SKGSTrainer(cfg, rcfg, scene, meta, model, pcd=(pts, cols),
                       gs_knn_num=5, gs_knn_update_interval=(10, 70),
                       capacity_buckets=buckets,
                       capacity_check_interval=16)


@pytest.mark.slow
def test_bucketed_training_matches_quality():
    """A bucketed run (min bucket clamped by a small max cap) trains to the
    same quality regime as the full-capacity run and actually resizes."""
    synthetic = make_synthetic_scene(
        seed=0, num_links=2, gauss_per_link=60, num_frames=8, h=48, w=48,
        pair_capacity=2 ** 13, chunk=64)
    cfg = tiny_cfg(8)
    big = _make_trainer(synthetic, cfg, n_cap=1024, buckets=False)
    small = _make_trainer(synthetic, cfg, n_cap=1024, buckets=True)
    # small buckets for the test (production default min is 4096)
    small._cap_min_bucket = 256
    small._cap_multiple = 64
    n_steps = cfg.stages['sp'][1]  # through end of sp
    for s in range(1, n_steps + 1):
        mb = big.train_step(s)
        ms = small.train_step(s)
    assert small.state.model.capacity < 1024  # actually bucketed
    lb, ls = float(mb['loss']), float(ms['loss'])
    assert np.isfinite(lb) and np.isfinite(ls)
    pb = float(big.evaluate(stage='sp')['PSNR'])
    psd = float(small.evaluate(stage='sp')['PSNR'])
    assert psd > pb - 2.0, (psd, pb)  # same quality regime


@pytest.mark.slow
def test_reinit_grows_bucket_to_fit_pcd():
    """A bucketed run whose capacity shrank below the pcd size must grow
    the bucket at the sp_fix re-initialization instead of asserting
    (hit live in the dense-scene run: init-stage superpoint replacement
    leaves ~M alive -> bucket shrinks -> reinit needs len(pcd) rows)."""
    synthetic = make_synthetic_scene(
        seed=0, num_links=2, gauss_per_link=60, num_frames=8, h=48, w=48,
        pair_capacity=2 ** 13, chunk=64)
    cfg = tiny_cfg(8)
    tr = _make_trainer(synthetic, cfg, n_cap=1024, buckets=True)
    tr._cap_min_bucket = 64
    tr._cap_multiple = 32
    # pcd bigger than the min bucket: after init_superpoints (16 alive at
    # step 10) the bucket collapses well below len(pcd)=200
    n_steps = cfg.stages['sp_fix'][0] + 2    # cross the reinit event
    for s in range(1, n_steps + 1):
        m = tr.train_step(s)
    assert tr.state.reinit_done
    n_alive = int(jnp.sum(tr.state.model.alive))
    assert n_alive == len(tr.pcd[0]), n_alive
    assert tr.state.model.capacity >= n_alive
    assert np.isfinite(float(m['loss']))
