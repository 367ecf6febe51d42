#!/usr/bin/env python
"""Pre-generate the 41.3M-row binary dataset for host_pipeline_41m on the CPU
backend only, so the TPU queue job skips the ~10-min generation leg (and the
generation process never attaches the single-client TPU tunnel).

Usage: python scripts/gen_41m_bin.py [--rows 41300000] [--dir /tmp/synth41m_bin]
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")   # noqa: E402 — before pkg imports

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from host_pipeline_41m import generate  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=41_300_000)
    ap.add_argument("--dir", default="/tmp/synth41m_bin")
    args = ap.parse_args()
    if os.path.exists(os.path.join(args.dir, "feature_sizes.npy")):
        print("already generated")
        return
    sizes = generate(args.dir, args.rows)
    np.save(os.path.join(args.dir, "feature_sizes.npy"), np.asarray(sizes))
    print("done")


if __name__ == "__main__":
    main()
