"""Save -> resume -> continue across the sp->sk stage boundary.

Regression for round-1 Weak #4: TrainerState flags (skeleton_initialized,
sp_initialized, reinit_done), gs_knn_index and the RNG key must round-trip
through checkpoints, so a resume inside sk_fix/sk does NOT re-run
init_skeleton (which would re-distill over the trained sk_deform and clobber
sp_weights / joints). Reference parity: my_ext/checkpoint.py:86-108 restores
everything stored.
"""
import jax
import jax.numpy as jnp
import numpy as np

from sk_gs_tpu.data.synthetic import make_synthetic_scene
from sk_gs_tpu.framework.checkpoint import CheckpointManager
from sk_gs_tpu.framework.trainer import SKGSTrainer
from sk_gs_tpu.models import sk_gs
from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
from sk_gs_tpu.render import RasterConfig

from test_trainer_e2e import tiny_cfg
import pytest

pytestmark = pytest.mark.slow


def make_trainer(synthetic, cfg, model_seed=0, trainer_seed=0):
    scene, meta, gt = synthetic
    rcfg = RasterConfig(image_width=48, image_height=48, sh_degree=1,
                        pair_capacity=2 ** 13, chunk=64, use_pallas=False)
    rng = np.random.default_rng(model_seed)
    pts = rng.uniform(-1.5, 1.5, size=(200, 3)).astype(np.float32)
    cols = rng.uniform(size=(200, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, cfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(model_seed), cfg, base,
                             np.asarray(meta.train_times))
    return SKGSTrainer(cfg, rcfg, scene, meta, model, pcd=(pts, cols),
                       gs_knn_num=5, gs_knn_update_interval=(10, 70),
                       seed=trainer_seed)


class TestResumeAcrossSkBoundary:
    def test_resume_inside_sk_preserves_skeleton(self, tmp_path):
        synthetic = make_synthetic_scene(
            seed=0, num_links=2, gauss_per_link=60, num_frames=8, h=48, w=48,
            pair_capacity=2 ** 13, chunk=64)
        cfg = tiny_cfg(8)
        # run A: train through sp + sk_init + a few sk steps, checkpoint
        a = make_trainer(synthetic, cfg)
        sk_start = cfg.stages['sk_init'][0]
        stop = sk_start + 8  # inside sk_fix/sk, after skeleton init
        for step in range(1, stop + 1):
            a.train_step(step)
        assert a.state.skeleton_initialized
        ckpt = CheckpointManager(tmp_path, interval=1)
        ckpt.save(a.ckpt_state(), stop, force=True)

        # run B: fresh trainer, resume from the checkpoint
        b = make_trainer(synthetic, cfg, model_seed=1)  # different init on purpose
        loaded = ckpt.load(b.ckpt_state())
        step0 = int(np.asarray(loaded['meta']['step']))
        assert step0 == stop
        b.restore(loaded['state'], step0)
        assert b.state.skeleton_initialized
        assert b.state.sp_initialized
        assert b.state.reinit_done
        # flags restored -> stage events must NOT re-run init_skeleton:
        # joints / sp_weights stay bit-identical through the event hook
        joints_before = np.asarray(b.state.model.params['joints']).copy()
        spw_before = np.asarray(b.state.model.sp_weights).copy()
        b.maybe_stage_events(step0 + 1)
        np.testing.assert_array_equal(
            np.asarray(b.state.model.params['joints']), joints_before)
        np.testing.assert_array_equal(
            np.asarray(b.state.model.sp_weights), spw_before)

        # continuing produces finite losses and identical next-step loss to
        # run A continuing (full state round-trip incl. RNG key)
        ma = a.train_step(stop + 1)
        mb = b.train_step(stop + 1)
        assert np.isfinite(float(mb['loss']))
        np.testing.assert_allclose(float(ma['loss']), float(mb['loss']),
                                   rtol=1e-5)

    def test_resume_directly_into_transition(self, tmp_path):
        """Resume from a checkpoint saved just BEFORE sk_init, so the very
        first resumed step runs init_skeleton with no jitted step having
        executed yet. Regression: the restored model's train_times is a
        NUMPY array on that path and the distill scan indexes it with a
        traced frame id (round-4 crash at the production 40k resume)."""
        synthetic = make_synthetic_scene(
            seed=0, num_links=2, gauss_per_link=60, num_frames=8, h=48, w=48,
            pair_capacity=2 ** 13, chunk=64)
        cfg = tiny_cfg(8)
        a = make_trainer(synthetic, cfg)
        stop = cfg.stages['sk_init'][0]  # last sp step (stage_at is
        # start-exclusive: sk_init covers (start, end])
        for step in range(1, stop + 1):
            a.train_step(step)
        assert not a.state.skeleton_initialized
        ckpt = CheckpointManager(tmp_path, interval=1)
        ckpt.save(a.ckpt_state(), stop, force=True)

        b = make_trainer(synthetic, cfg, model_seed=1)
        loaded = ckpt.load(b.ckpt_state())
        b.restore(loaded['state'], stop)
        assert not b.state.skeleton_initialized
        # numpy leaf, as after a real checkpoint load
        assert isinstance(np.asarray(b.state.model.train_times), np.ndarray)
        m = b.train_step(stop + 1)  # fires init_skeleton first
        assert b.state.skeleton_initialized
        assert np.isfinite(float(m['loss']))

    def test_legacy_checkpoint_flag_inference(self, tmp_path):
        """Checkpoints without flags (round-1 format) infer flags from the
        schedule position instead of re-running stage events."""
        synthetic = make_synthetic_scene(
            seed=0, num_links=2, gauss_per_link=60, num_frames=8, h=48, w=48,
            pair_capacity=2 ** 13, chunk=64)
        cfg = tiny_cfg(8)
        a = make_trainer(synthetic, cfg)
        stop = cfg.stages['sk_init'][0] + 8
        for step in range(1, stop + 1):
            a.train_step(step)
        ckpt = CheckpointManager(tmp_path, interval=1)
        legacy = {'model': a.state.model, 'opt': a.state.opt_state}
        ckpt.save(legacy, stop, force=True)

        b = make_trainer(synthetic, cfg, model_seed=1)
        loaded = ckpt.load(b.ckpt_state())
        b.restore(loaded['state'], stop)
        assert b.state.skeleton_initialized  # inferred from stage
        assert b.state.sp_initialized
        assert b.state.reinit_done
        # smooth-loss KNN index was rebuilt if stage needs it; next step runs
        m = b.train_step(stop + 1)
        assert np.isfinite(float(m['loss']))
