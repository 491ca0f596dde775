#!/usr/bin/env python
"""Aggregate results.json files into a table
(reference counterpart: /root/reference/scripts/show_results.py).

    python scripts/show_results.py results/
"""
import argparse
import json
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('root', nargs='?', default='results')
    parser.add_argument('--metric', default=None,
                        help='only print one metric column')
    args = parser.parse_args()

    rows = []
    for path in sorted(Path(args.root).rglob('results.json')):
        with path.open() as f:
            data = json.load(f)
        rows.append((str(path.parent.relative_to(args.root)), data))
    if not rows:
        print(f'no results.json under {args.root}')
        return

    keys = sorted({k for _, d in rows for k in d
                   if isinstance(d[k], (int, float))})
    if args.metric:
        keys = [k for k in keys if k == args.metric]
    name_w = max(len(n) for n, _ in rows) + 2
    print('scene'.ljust(name_w) + ''.join(k.rjust(12) for k in keys))
    sums = {k: [] for k in keys}
    for name, d in rows:
        cells = []
        for k in keys:
            v = d.get(k)
            cells.append(f'{v:12.4f}' if isinstance(v, (int, float)) else ' ' * 12)
            if isinstance(v, (int, float)):
                sums[k].append(v)
        print(name.ljust(name_w) + ''.join(cells))
    print('mean'.ljust(name_w) + ''.join(
        f'{sum(v) / len(v):12.4f}' if v else ' ' * 12
        for v in (sums[k] for k in keys)))


if __name__ == '__main__':
    main()
