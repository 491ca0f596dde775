"""Export calibrated LPIPS weights to the npz format sk_gs_tpu loads.

Run this on a machine WITH torchvision and network egress (this container
has neither), then copy the outputs into ``<repo>/weights/``:

    python tools/export_lpips_weights.py --out weights/

It downloads the ImageNet feature weights via torchvision and the richzhang
v0.1 linear calibration heads (the same URL the reference's
my_ext/metrics/lpipsPyTorch/modules/utils.py:11-21 uses), and writes
``lpips_alex.npz`` / ``lpips_vgg.npz`` with keys

    conv{i}_w [Cout, Cin, k, k], conv{i}_b [Cout]   -- feature stack, in order
    lin{j}_w  [C]                                    -- 1x1 calibration convs

matching sk_gs_tpu.framework.lpips_jax.load_weights. With these files in
place, lpips_mode() reports 'calibrated-npz' and values match the reference
implementation to float tolerance.
"""
import argparse
import os

import numpy as np


def export(net: str, out_dir: str) -> str:
    import torch
    from torchvision import models

    if net == 'alex':
        feats = models.alexnet(weights=models.AlexNet_Weights.IMAGENET1K_V1).features
    elif net == 'vgg':
        feats = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1).features
    else:
        raise ValueError(net)

    params = {}
    ci = 0
    for m in feats:
        if isinstance(m, torch.nn.Conv2d):
            params[f'conv{ci}_w'] = m.weight.detach().numpy().astype(np.float32)
            params[f'conv{ci}_b'] = m.bias.detach().numpy().astype(np.float32)
            ci += 1

    url = ('https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/'
           f'master/lpips/weights/v0.1/{net}.pth')
    sd = torch.hub.load_state_dict_from_url(url, map_location='cpu')
    # keys: lin{j}.model.1.weight with shape [1, C, 1, 1]
    j = 0
    while f'lin{j}.model.1.weight' in sd:
        params[f'lin{j}_w'] = (
            sd[f'lin{j}.model.1.weight'].detach().numpy()
            .reshape(-1).astype(np.float32))
        j += 1
    assert j == 5, f'expected 5 lin layers, got {j}'

    path = os.path.join(out_dir, f'lpips_{net}.npz')
    np.savez(path, **params)
    return path


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='weights')
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for net in ('alex', 'vgg'):
        print('wrote', export(net, args.out))
