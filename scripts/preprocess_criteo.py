#!/usr/bin/env python
"""Offline Criteo preprocessing CLI (counterpart of the reference's
``data/large/preprocess_criteo.py`` script).

Usage: python scripts/preprocess_criteo.py <raw_train.txt> <out_dir>
       [--cutoff 4] [--max-rows N] [--valid-test-fraction 0.1]
"""

import argparse
import sys

sys.path.insert(0, ".")

from xsdeepfwfm_deprecated_tpu.data.preprocess import preprocess_criteo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("raw_path")
    ap.add_argument("out_dir")
    ap.add_argument("--cutoff", type=int, default=4)
    ap.add_argument("--max-rows", type=int, default=None)
    ap.add_argument("--valid-test-fraction", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    paths = preprocess_criteo(args.raw_path, args.out_dir, cutoff=args.cutoff,
                              max_rows=args.max_rows,
                              valid_test_fraction=args.valid_test_fraction,
                              seed=args.seed)
    for p in paths:
        print(p)


if __name__ == "__main__":
    main()
