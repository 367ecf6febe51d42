#!/usr/bin/env python
"""One-command reproduction of every TPU measurement in RESULTS.md.

Run on a free chip (verify with a trivial op first — see CLAUDE.md):
    python benchmarks/run_all_tpu.py
"""
import json
import subprocess
import sys

STEPS = [
    ("serve bench", [sys.executable, "bench.py"]),
    ("train bench", [sys.executable, "benchmarks/train_bench.py"]),
    ("synthetic 1M-row run",
     [sys.executable, "scripts/synthetic_scale_run.py", "--rows", "200000",
      "--epochs", "2"]),
]

def main():
    for name, cmd in STEPS:
        print(f"=== {name}: {' '.join(cmd[1:])}")
        r = subprocess.run(cmd, timeout=3600)
        if r.returncode != 0:
            print(f"{name} FAILED rc={r.returncode}")
            return 1
    return 0

if __name__ == "__main__":
    sys.exit(main())
