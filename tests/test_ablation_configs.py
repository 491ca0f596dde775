"""Every ablation config resolves and its flipped knob actually lands in the
built model config (fleet parity: /root/reference/scripts/run_ablation_study.sh:17-28
enumerates these case names; the per-case yamls are not shipped upstream, so the
variant values here are chosen from the knob defaults in networks/sk_gs.py)."""
from pathlib import Path

import pytest

ABLATION_ROOT = Path(__file__).resolve().parent.parent / 'configs' / 'ablations'

REFERENCE_CASES = {
    'num_sp', 'warp', 'sp_control', 'num_knn', 'lr_deform', 'sk_knn_num',
    'loss_sparse', 'loss_re_pos', 'loss_sp_arap', 'loss_smooth',
    'loss_joint', 'loss_cmp_p',
}

ALL_YAMLS = sorted(ABLATION_ROOT.glob('*/*.yaml'))


def _build(path):
    from train import build_model_cfg
    from sk_gs_tpu.framework.config import make_config

    class Meta:
        num_frames = 8

    cfg = make_config(str(path), [])
    skcfg, rcfg = build_model_cfg(cfg, Meta, (64, 64))
    return cfg, skcfg, rcfg


def test_case_set_matches_reference_fleet():
    present = {p.name for p in ABLATION_ROOT.iterdir() if p.is_dir()}
    missing = REFERENCE_CASES - present
    assert not missing, f'ablation cases missing vs reference fleet: {missing}'


@pytest.mark.parametrize('path', ALL_YAMLS, ids=lambda p: f'{p.parent.name}/{p.stem}')
def test_ablation_config_resolves(path):
    cfg, skcfg, rcfg = _build(path)
    assert skcfg.gauss.capacity > 0
    assert rcfg.image_width > 0


def test_flipped_knobs_land():
    _, sk, _ = _build(ABLATION_ROOT / 'warp' / 'largest.yaml')
    assert sk.warp_method == 'largest'
    _, sk, _ = _build(ABLATION_ROOT / 'warp' / 'lbs_c.yaml')
    assert sk.warp_method == 'LBS_c'
    _, sk, _ = _build(ABLATION_ROOT / 'sp_control' / 'no_sp_control.yaml')
    assert sk.sp_adjust_interval[0] == 0 and sk.sp_merge_interval[0] == 0
    _, sk, _ = _build(ABLATION_ROOT / 'num_knn' / 'knn3.yaml')
    assert sk.num_knn == 3
    _, sk, _ = _build(ABLATION_ROOT / 'lr_deform' / 'lr0.1x.yaml')
    assert sk.lr_deform_scale == pytest.approx(0.1)
    _, sk, _ = _build(ABLATION_ROOT / 'sk_knn_num' / 'sk_knn12.yaml')
    assert sk.sk_knn_num == 12
    _, sk, _ = _build(ABLATION_ROOT / 'num_sp' / 'sp256.yaml')
    assert sk.num_superpoints == 256


def test_flipped_loss_weights_land():
    cfg, _, _ = _build(ABLATION_ROOT / 'loss_re_pos' / 're_pos1.yaml')
    assert float(cfg['loss']['re_pos']) == 1.0
    cfg, _, _ = _build(ABLATION_ROOT / 'loss_sp_arap' / 'sp_arap.yaml')
    assert float(cfg['loss']['sp_arap_t']) == 0.01
    cfg, _, _ = _build(ABLATION_ROOT / 'loss_smooth' / 'no_smooth.yaml')
    assert float(cfg['loss']['smooth']) == 0.0
    cfg, _, _ = _build(ABLATION_ROOT / 'loss_joint' / 'no_joint.yaml')
    assert float(cfg['loss']['joint']) == 0.0
    assert float(cfg['loss']['joint_all']) == 0.0
    cfg, _, _ = _build(ABLATION_ROOT / 'loss_cmp_p' / 'no_cmp_p.yaml')
    assert float(cfg['loss']['cmp_p']) == 0.0
    cfg, _, _ = _build(ABLATION_ROOT / 'loss_sparse' / 'no_sparse.yaml')
    assert float(cfg['loss']['sparse']) == 0.0
