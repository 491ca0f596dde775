#!/usr/bin/env python
"""Compare two result trees side by side
(reference counterpart: /root/reference/scripts/compare_results.py).

    python scripts/compare_results.py results_a/ results_b/
"""
import argparse
import json
from pathlib import Path


def collect(root):
    out = {}
    for path in sorted(Path(root).rglob('results.json')):
        with path.open() as f:
            out[str(path.parent.relative_to(root))] = json.load(f)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('a')
    parser.add_argument('b')
    parser.add_argument('--metric', default='PSNR')
    args = parser.parse_args()
    a, b = collect(args.a), collect(args.b)
    scenes = sorted(set(a) | set(b))
    m = args.metric
    print(f'{"scene":30}{args.a:>14}{args.b:>14}{"delta":>10}')
    da, db = [], []
    for s in scenes:
        va = a.get(s, {}).get(m)
        vb = b.get(s, {}).get(m)
        cell = lambda v: f'{v:14.4f}' if isinstance(v, (int, float)) else ' ' * 14
        delta = (f'{vb - va:10.4f}'
                 if isinstance(va, (int, float)) and isinstance(vb, (int, float))
                 else ' ' * 10)
        print(f'{s:30}{cell(va)}{cell(vb)}{delta}')
        if isinstance(va, (int, float)):
            da.append(va)
        if isinstance(vb, (int, float)):
            db.append(vb)
    if da and db:
        print(f'{"mean":30}{sum(da)/len(da):14.4f}{sum(db)/len(db):14.4f}'
              f'{sum(db)/len(db) - sum(da)/len(da):10.4f}')


if __name__ == '__main__':
    main()
