"""Golden loader tests (VERDICT r2 #9): our loaders vs tensors captured from
the REFERENCE dataset classes on the committed real-format fixtures.

The expected values in tests/fixtures/golden/golden.npz were produced by
running /root/reference/datasets/{DNerfDataset,WIM,ZJU_MoCAP}.py on the
fixtures (tools/make_golden_fixtures.py regenerates both), with the
production conventions: D-NeRF and WIM opengl->colmap (exps/d_nerf.yaml,
wim.yaml), pickled ZJU colmap->colmap with move_center=false
(exps/zju.yaml). So loader correctness no longer rests on self-built
expectations: every Tw2v / Tv2c / campos / time / image below is pinned to
what the reference's own math emits, at 1e-6 (camera matrices) / 1e-5 (fov)
/ 2e-3 (images; uint8 quantization + resampling differences).
"""
from pathlib import Path

import numpy as np
import pytest

FIX = Path(__file__).parent / 'fixtures' / 'golden'


@pytest.fixture(scope='module')
def golden():
    return dict(np.load(FIX / 'golden.npz'))


def test_dnerf_golden(golden):
    from sk_gs_tpu.data.dnerf import load_dnerf
    scene, meta = load_dnerf(str(FIX / 'dnerf'), 'mini', split='train',
                             background='white', coord_src='opengl',
                             coord_dst='colmap', near=2.0, far=6.0)
    assert scene.num_views == 2
    for i in range(2):
        np.testing.assert_allclose(np.asarray(scene.Tw2v[i]),
                                   golden[f'dnerf_Tw2v_{i}'],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(scene.Tv2c[i]),
                                   golden[f'dnerf_Tv2c_{i}'],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(scene.campos[i]),
                                   golden[f'dnerf_campos_{i}'],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(float(scene.times[i]),
                                   float(golden[f'dnerf_t_{i}']), atol=1e-7)
        # reference keeps RGBA with white lerped into RGB; ours composites
        ref_rgb = golden[f'dnerf_img_{i}'][..., :3]
        np.testing.assert_allclose(np.asarray(scene.images[i]), ref_rgb,
                                   rtol=0, atol=2e-3)
    fovx, fovy = golden['dnerf_FoV']
    np.testing.assert_allclose(float(scene.tan_fovx[0]),
                               np.tan(fovx / 2), rtol=1e-5)
    np.testing.assert_allclose(float(scene.tan_fovy[0]),
                               np.tan(fovy / 2), rtol=1e-5)


def test_wim_golden(golden):
    from sk_gs_tpu.data.wim import load_wim
    scene, meta = load_wim(str(FIX / 'wim'), 'mini', split='train',
                           background='white', frame_ranges=(0, 2),
                           coord_src='opengl', coord_dst='colmap',
                           near=0.01, far=1000.0)
    n_cams = 18  # 20 minus test cameras {0, 10}
    assert scene.num_views == 2 * n_cams
    # reference holds one matrix per CAMERA; ours one per (frame, camera)
    # view in frame-major order (WIM.py:106-111)
    for k in range(n_cams):
        np.testing.assert_allclose(np.asarray(scene.Tw2v[k]),
                                   golden['wim_Tw2v'][k], rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(scene.Tw2v[n_cams + k]),
                                   golden['wim_Tw2v'][k], rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(scene.campos[k]),
                                   golden['wim_Tv2w'][k, :3, 3],
                                   rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.Tv2c[0]),
                               golden['wim_Tv2c'], rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.times),
                               golden['wim_times'], atol=1e-7)
    np.testing.assert_array_equal(np.asarray(scene.time_ids),
                                  golden['wim_time_ids'])
    np.testing.assert_array_equal(np.asarray(scene.camera_ids),
                                  golden['wim_camera_ids'])
    fovx, fovy = golden['wim_FoV']
    np.testing.assert_allclose(float(scene.tan_fovx[0]),
                               np.tan(fovx / 2), rtol=1e-5)
    ref_sub = golden['wim_img0_sub'][..., :3]
    np.testing.assert_allclose(np.asarray(scene.images[0])[::37, ::41],
                               ref_sub, rtol=0, atol=2e-3)


def test_zju_pickled_golden(golden):
    from sk_gs_tpu.data.zju import load_zju_pickled
    scene, meta = load_zju_pickled(str(FIX / 'zju'), '313',
                                   pickle_path='cache_train.pickle',
                                   image_size=32, compression=False,
                                   background='black', move_center=False,
                                   near=0.1, far=1000.0)
    n_cams = 3
    assert scene.num_views == 2 * n_cams
    for k in range(n_cams):
        np.testing.assert_allclose(np.asarray(scene.Tw2v[k]),
                                   golden['zju_Tw2v'][k], rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(scene.campos[k]),
                                   golden['zju_Tv2w'][k, :3, 3],
                                   rtol=0, atol=1e-5)
        # per-camera projection with off-center principal point
        np.testing.assert_allclose(np.asarray(scene.Tv2c[k]),
                                   golden['zju_Tv2c'][k], rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.times),
                               golden['zju_times'], atol=1e-7)
    np.testing.assert_array_equal(np.asarray(scene.time_ids),
                                  golden['zju_time_ids'])
    np.testing.assert_array_equal(np.asarray(scene.camera_ids),
                                  golden['zju_camera_ids'])
    for k in range(n_cams):
        fovx, fovy = golden['zju_FoV'][k]
        np.testing.assert_allclose(float(scene.tan_fovx[k]),
                                   np.tan(fovx / 2), rtol=1e-5)
        np.testing.assert_allclose(float(scene.tan_fovy[k]),
                                   np.tan(fovy / 2), rtol=1e-5)
    # reference: uint8 0..255 RGBA, black where mask < 128 (binary mask ->
    # identical to our alpha composite)
    ref_rgb = golden['zju_img0'][..., :3].astype(np.float32) / 255.0
    np.testing.assert_allclose(np.asarray(scene.images[0]), ref_rgb,
                               rtol=0, atol=2e-3)
