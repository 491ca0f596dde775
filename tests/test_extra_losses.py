"""Optional reference losses wired end-to-end: re_pos (loss_reconstruct,
sk_gs.py:1489), jp_dist (:1560), sp_arap_t/ct (loss_sp_arap :1371), guided
(loss_guided_sp :1438), arap_p (loss_points_arap :1361) + init-stage
elastic/acc/arap on sampled gaussians (loss() :1539-1547)."""
import jax
import numpy as np
import pytest

from sk_gs_tpu.data.synthetic import make_synthetic_scene
from sk_gs_tpu.framework.trainer import SKGSTrainer
from sk_gs_tpu.models import sk_gs
from sk_gs_tpu.models.deform import DeformNetConfig, SkeletonNetConfig
from sk_gs_tpu.models.gaussian_splatting import GaussianConfig, init_from_pcd
from sk_gs_tpu.models.losses import LossWeights
from sk_gs_tpu.render import RasterConfig

pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def tiny_scene():
    return make_synthetic_scene(seed=0, num_links=2, gauss_per_link=40,
                                num_frames=4, h=32, w=32,
                                pair_capacity=2 ** 12, chunk=64)


def make_trainer(tiny_scene, weights):
    scene, meta, _ = tiny_scene
    cfg = sk_gs.SKGSConfig(
        gauss=GaussianConfig(capacity=128, sh_degree=0,
                             densify_interval=(10 ** 6, 10, 10 ** 7),
                             prune_interval=(10 ** 6, 10, 10 ** 7),
                             opacity_reset_interval=(10 ** 6, 10 ** 6, -1)),
        net=DeformNetConfig(depth=2, width=32, is_blender=True),
        sk_net=SkeletonNetConfig(out_dims=(4, 4, 3), width=32, depth=2,
                                 skips=(1,)),
        train_schedule=(('static', 0), ('init_fix', 2), ('init', 4),
                        ('sp_fix', 2), ('sp', 8), ('sk_init', 0),
                        ('sk_fix', 0), ('sk', 0)),
        num_superpoints=8, num_knn=3, hyper_dim=2,
        num_frames=meta.num_frames, sk_knn_num=3, init_num_times=2,
        init_sampling_step=3, joint_init_steps=5,
        joint_update_interval=(2, 3, 10 ** 6), guided_step_start=0)
    rcfg = RasterConfig(image_width=32, image_height=32, sh_degree=0,
                        pair_capacity=2 ** 12, chunk=64, use_pallas=False)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, cfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), cfg, base,
                             np.asarray(meta.train_times))
    return cfg, SKGSTrainer(cfg, rcfg, scene, meta, model,
                            loss_weights=LossWeights(weights),
                            pcd=(pts, cols), gs_knn_num=3,
                            gs_knn_update_interval=(2, 10 ** 7))


class TestExtraLosses:
    def test_all_extras_finite_through_schedule(self, tiny_scene):
        weights = {'image': {'method': 'l1', 'lambda': 0.8}, 'ssim': 0.2,
                   'sparse': 0.1, 'smooth': 0.1, 'joint': 1.0,
                   'joint_all': 1.0, 'c_net': 1.0, 'cmp_p': 1.0,
                   'cmp_t': 0.01, 'cmp_r': 0.01, 'cmp_s': 0.01,
                   're_pos': 0.5, 'jp_dist': 0.5, 'sp_arap_t': 0.01,
                   'sp_arap_ct': 0.01, 'arap_p': 1.0,
                   'elastic': 0.1, 'acc': 0.1, 'arap': 0.1}
        cfg, tr = make_trainer(tiny_scene, weights)
        mets = None
        for step in range(1, cfg.total_steps + 1):
            mets = tr.train_step(step)
            assert np.isfinite(mets['loss']), f'step {step}: {mets}'
        for name in ('re_pos', 'jp_dist', 'sp_arap_t', 'sp_arap_ct',
                     'g_cmp_t', 'g_cmp_r', 'g_cmp_s'):
            assert name in mets and np.isfinite(mets[name]), name

    def test_init_motion_reg_on_sampled_gaussians(self, tiny_scene):
        # elastic/acc/arap at the init stage must not touch the (not yet
        # initialized) superpoints — regression for the inf-gradient NaN
        weights = {'image': {'method': 'l1', 'lambda': 0.8}, 'ssim': 0.2,
                   'elastic': 0.1, 'acc': 0.1, 'arap': 0.1, 'arap_p': 1.0}
        cfg, tr = make_trainer(tiny_scene, weights)
        for step in range(1, 7):
            mets = tr.train_step(step)
            assert np.isfinite(mets['loss']), f'step {step}: {mets}'
