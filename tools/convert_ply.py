#!/usr/bin/env python
"""Convert a 3DGS-standard PLY (e.g. Inria-trained) into an sk_gs_tpu
checkpoint-style params npz.

Reference counterpart: ``convert_offical_to_ours``
(/root/reference/networks/gaussian_splatting.py:706-753) — note the
quaternion layout permutation: the Inria ecosystem stores (w,x,y,z); this
framework uses (x,y,z,w) (SURVEY §2.4).

    python tools/convert_ply.py point_cloud.ply out_params.npz \
        [--capacity 200000] [--wxyz]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('ply')
    parser.add_argument('out')
    parser.add_argument('--capacity', type=int, default=0,
                        help='pad to this capacity (0 = exact size)')
    parser.add_argument('--wxyz', action='store_true',
                        help='input rotations are (w,x,y,z) (Inria layout); '
                             'permute to (x,y,z,w)')
    args = parser.parse_args(argv)

    from sk_gs_tpu.utils.ply import load_gaussian_ply
    params = load_gaussian_ply(args.ply)
    n = params['xyz'].shape[0]
    if args.wxyz:
        params['rotation'] = params['rotation'][:, [1, 2, 3, 0]]

    cap = max(args.capacity, n)
    out = {}
    for k, v in params.items():
        if cap > n:
            pad = np.zeros((cap - n, *v.shape[1:]), v.dtype)
            if k == 'rotation':
                pad[:, 3] = 1.0
            v = np.concatenate([v, pad], axis=0)
        out[k] = v
    out['alive'] = np.arange(cap) < n
    np.savez(args.out, **out)
    print(f'converted {n} gaussians (capacity {cap}) -> {args.out}')


if __name__ == '__main__':
    main()
