#!/usr/bin/env python
"""Generate tiny real-format dataset fixtures + golden tensors captured from
the REFERENCE loaders (VERDICT r2 #9).

Writes tests/fixtures/golden/{dnerf,wim,zju}/... (few-KB real-format files)
and tests/fixtures/golden/golden.npz holding, for each format, the exact
Tw2v / Tv2c / campos / times / fov values the reference dataset classes
(/root/reference/datasets/{DNerfDataset,WIM,ZJU_MoCAP}.py) produce on those
fixtures, with the production coordinate conventions
(exps/d_nerf.yaml, wim.yaml: opengl->colmap; zju.yaml: colmap->colmap).

Dev-only tool: needs /root/reference (read-only) + torch; the captured npz
and fixtures are committed, so the golden TESTS (tests/test_golden_loaders.py)
run anywhere. The reference tree has two unimportable-here imports
(dearpygui, lietorch) that get stub modules on PYTHONPATH — behaviorally
inert for the camera math being captured.
"""
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / 'tests' / 'fixtures' / 'golden'
REF = Path('/root/reference')


def write_png(path: Path, h: int, w: int, seed: int, alpha=True):
    """Deterministic smooth-gradient image (compresses to a few KB even at
    800x800) with a non-trivial alpha so background compositing is tested."""
    from PIL import Image
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy + 17 * seed) % 256).astype(np.uint8)
    a = np.where((xx // 8) % 2 == 0, 255, 128).astype(np.uint8)
    chans = [r, g, b] + ([a] if alpha else [])
    img = np.stack(chans, -1)
    Image.fromarray(img, 'RGBA' if alpha else 'RGB').save(path)


def rotation(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def make_c2w(ang, elev=0.35, radius=4.0):
    """OpenGL camera-to-world orbiting the origin (NeRF convention)."""
    eye = radius * np.array([np.sin(ang) * np.cos(elev), np.sin(elev),
                             np.cos(ang) * np.cos(elev)])
    fwd = -eye / np.linalg.norm(eye)              # camera looks at origin
    up0 = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up0)
    right = right / np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -fwd                              # opengl: +z backward
    c2w[:3, 3] = eye
    return c2w


def make_dnerf_fixture():
    root = OUT / 'dnerf' / 'mini'
    (root / 'train').mkdir(parents=True, exist_ok=True)
    frames = []
    for i in range(2):
        c2w = make_c2w(0.4 + 0.9 * i, elev=0.2 + 0.3 * i)
        write_png(root / 'train' / f'r_{i}.png', 16, 16, seed=10 + i)
        frames.append({'file_path': f'./train/r_{i}',
                       'time': i / 1.0,
                       'transform_matrix': c2w.tolist()})
    meta = {'camera_angle_x': 0.6911112070083618, 'frames': frames}
    (root / 'transforms_train.json').write_text(json.dumps(meta, indent=1))


def make_wim_fixture():
    root = OUT / 'wim' / 'mini'
    root.mkdir(parents=True, exist_ok=True)
    for cam in range(20):
        c2w = make_c2w(0.31 * cam, elev=0.25)
        info = {'camera_data': {
            # WIM stores cam2world TRANSPOSED (WIM.py:65 reads .T)
            'cam2world': c2w.T.tolist(),
            'width': 800, 'height': 800,
            'intrinsics': {'cx': 400.0, 'cy': 400.0,
                           'fx': 1111.111, 'fy': 1111.111},
        }}
        (root / f'cam_{cam:03d}.json').write_text(json.dumps(info))
    # loader reads only image_paths[0] at init (WIM.py:113); 2 frames of
    # train cam 1 + first frames of the other train cams for OUR loader,
    # which reads the first image per (frame, cam) lazily -> keep it to the
    # ones either loader touches: reference touches frame_00000_cam_001 only
    for fid in range(2):
        for cid in [c for c in range(20) if c not in (0, 10)]:
            p = root / f'frame_{fid:05d}_cam_{cid:03d}.png'
            write_png(p, 800, 800, seed=100 + fid * 32 + cid)
    # test split touches cams 0 and 10
    for fid in range(2):
        for cid in (0, 10):
            write_png(root / f'frame_{fid:05d}_cam_{cid:03d}.png', 800, 800,
                      seed=100 + fid * 32 + cid)


def make_zju_fixture():
    """Pickled-cache variant — the one the production zju.yaml uses
    (dataset: ZJU_MoCap_2; the reference's non-pickled ZJUMoCapDataset
    crashes in its own tree: FoV is never set before
    complete_transform_matrices). Uncompressed (no blosc in either env)."""
    import pickle
    root = OUT / 'zju' / '313'
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    n_cams, n_frames, hw = 3, 2, 32
    # layout: index = camera_id * imgs_per_cam + frame_pos
    frame_id = np.asarray([4, 6], np.int64)       # non-trivial id_min/fid_max
    imgs, masks, intr, rots, trans = [], [], [], [], []
    for c in range(n_cams):
        for f in range(n_frames):
            yy, xx = np.mgrid[0:hw, 0:hw]
            img = np.stack([
                (xx * 255 // (hw - 1)), (yy * 255 // (hw - 1)),
                ((xx + yy + 13 * (c + f)) % 256)], 0).astype(np.uint8)
            imgs.append(img)                       # [3, H, W] uint8
            masks.append(((xx + yy) % 4 != 0)[None])  # [1, H, W] bool
            intr.append(np.array([[40.0 + c, 0, 17.0],
                                  [0, 41.0 + c, 15.0],
                                  [0, 0, 1.0]]))
            rots.append(rotation([0.2, 1.0, 0.1 * c], 0.5 + 0.4 * c))
            trans.append(rng.normal(size=(3, 1)) * 0.8
                         + np.array([[0], [0], [4.0]]))
    data = {
        'frame_id': frame_id,
        'camera_id': np.arange(n_cams, dtype=np.int64),
        'img': imgs, 'mask': masks,
        'camera_intrinsic': intr,
        'camera_rotation': rots,
        'camera_translation': trans,
    }
    with open(root / 'cache_train.pickle', 'wb') as f:
        pickle.dump(data, f)


CAPTURE = r"""
import json, sys
from pathlib import Path
import numpy as np
import torch

sys.path.insert(0, '/root/reference')
out = {}

from datasets.DNerfDataset import DNeRFDataset
ds = DNeRFDataset(root=Path(sys.argv[1]) / 'dnerf', scene='mini',
                  split='train', coord_src='opengl', coord_dst='colmap',
                  background='white', near=2.0, far=6.0, with_rays=False,
                  use_time=True)
for i in range(2):
    inputs, targets, infos = ds.camera_ray(i)
    out[f'dnerf_Tw2v_{i}'] = infos['Tw2v'].numpy()
    out[f'dnerf_Tv2c_{i}'] = infos['Tv2c'].numpy()
    out[f'dnerf_campos_{i}'] = infos['campos'].numpy()
    out[f'dnerf_t_{i}'] = np.float32(inputs['t'])
    out[f'dnerf_img_{i}'] = targets['images'].numpy()
out['dnerf_FoV'] = ds.FoV.numpy()

from datasets.WIM import WatchItMoveDataset
ds = WatchItMoveDataset(root=Path(sys.argv[1]) / 'wim', scene='mini',
                        split='train', coord_src='opengl',
                        coord_dst='colmap', background='white',
                        frame_ranges=(0, 2), with_rays=False)
out['wim_Tw2v'] = ds.Tw2v.numpy()
out['wim_Tv2c'] = (ds.Tv2c.numpy() if ds.Tv2c.ndim == 2
                   else ds.Tv2c.numpy())
out['wim_Tv2w'] = ds.Tv2w.numpy()
out['wim_times'] = ds.times.numpy()
out['wim_time_ids'] = ds.time_ids.numpy()
out['wim_camera_ids'] = ds.camera_ids.numpy()
out['wim_FoV'] = ds.FoV.numpy()
out['wim_img0_sub'] = ds.images[0][::37, ::41].numpy()
out['wim_img0_mean'] = ds.images[0].numpy().mean(axis=(0, 1))

from datasets.ZJU_MoCAP import ZJU_MoCAP_Dataset_pickled
ds = ZJU_MoCAP_Dataset_pickled(
    root=Path(sys.argv[1]) / 'zju', scene='313',
    pickle_path='cache_train.pickle', image_size=32, compression=False,
    background='black', move_center=False, coord_src='colmap',
    coord_dst='colmap', with_rays=False, batch_mode=True)
out['zju_Tw2v'] = ds.Tw2v.numpy()
out['zju_Tv2c'] = ds.Tv2c.numpy()
out['zju_Tv2w'] = ds.Tv2w.numpy()
out['zju_times'] = ds.times.numpy()
out['zju_time_ids'] = ds.time_ids.numpy()
out['zju_camera_ids'] = ds.camera_ids.numpy()
out['zju_FoV'] = ds.FoV.numpy()
out['zju_img0'] = ds.images[0].numpy()

np.savez_compressed(sys.argv[2], **{k: np.asarray(v) for k, v in out.items()})
print('golden captured:', sorted(out))
"""


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    make_dnerf_fixture()
    make_wim_fixture()
    make_zju_fixture()

    with tempfile.TemporaryDirectory() as td:
        stub = Path(td) / 'stubs'
        (stub / 'dearpygui').mkdir(parents=True)
        (stub / 'dearpygui' / '__init__.py').write_text('')
        (stub / 'dearpygui' / 'dearpygui.py').write_text(
            'def __getattr__(n):\n'
            '    return lambda *a, **k: None\n')
        (stub / 'lietorch.py').write_text(
            'class SO3:\n'
            '    def __init__(self, *a, **k):\n'
            "        raise NotImplementedError('stub')\n"
            'class SE3(SO3):\n'
            '    pass\n')
        script = Path(td) / 'capture.py'
        script.write_text(CAPTURE)
        env = dict(os.environ,
                   PYTHONPATH=f'{stub}:/root/reference',
                   JAX_PLATFORMS='cpu')
        r = subprocess.run([sys.executable, str(script), str(OUT),
                            str(OUT / 'golden.npz')],
                           cwd='/root/reference', env=env,
                           capture_output=True, text=True, timeout=600)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            sys.exit(1)
    print('fixtures + golden.npz written under', OUT)


if __name__ == '__main__':
    main()
