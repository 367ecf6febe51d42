#!/usr/bin/env python
"""Map the train-step trace's hottest op names (fusion.2, reshape.129, ...)
back to source operations via the compiled HLO's op metadata.

Compiles the K-step training dispatch for the attached TPU and prints, for
each requested HLO instruction name, its root op metadata (jax op_name +
source line) and shapes — turning trace guesswork into facts.

Usage: python scripts/inspect_train_hlo.py fusion.2 reshape.129 fusion fusion.5
"""

import re
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    targets = sys.argv[1:] or ["fusion.2", "reshape.129", "fusion",
                               "fusion.5", "multiply_reduce_fusion", "sort",
                               "copy.77", "copy.70", "fusion.86"]
    import jax
    import jax.numpy as jnp
    from functools import partial

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.config import TrainConfig
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.ops import superpack
    from xsdeepfwfm_deprecated_tpu.train.trainer import (make_multi_step,
                                                         make_optimizer)
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = _flagship(full_criteo=True)
    tcfg = TrainConfig(batch_size=2048, steps_per_call=16)
    spec = deepfwfm.make_embedding_spec(cfg)
    params = superpack.pack_params(
        jax.jit(lambda s: deepfwfm.init_params(s, cfg))(jax.random.PRNGKey(0)),
        spec)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    multi = make_multi_step(cfg, tcfg, optimizer,
                            forward_fn=partial(deepfwfm.forward,
                                               lookup_fn=superpack.super_lookup))
    k, b = 16, 2048
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(0, [s for s in cfg.feature_sizes[13:]],
                                  size=(k, b, 26)).astype(np.int32))
    xv = jnp.asarray(rng.normal(size=(k, b, 13)).astype(np.float32))
    y = jnp.asarray((rng.random((k, b)) < 0.3).astype(np.float32))
    mask = jnp.ones((k, b), jnp.float32)
    key = jax.random.PRNGKey(1)
    zeros_t = jnp.zeros((k, b), jnp.float32)

    txt = (multi.lower(params, opt_state, xi, xv, y, mask, key, zeros_t)
           .compile().as_text())
    print(f"HLO text: {len(txt)/1e6:.1f} MB")
    lines = txt.splitlines()
    for t in targets:
        pat = re.compile(rf'^\s*(?:ROOT\s+)?%?{re.escape(t)}\s*=')
        hits = [i for i, ln in enumerate(lines) if pat.search(ln)]
        print(f"\n### {t}: {len(hits)} definition(s)")
        for i in hits[:2]:
            ln = lines[i]
            shape = ln.split("=", 1)[1].strip()[:120]
            print(f"  shape/def: {shape}")
            m = re.search(r'metadata=\{([^}]*)\}', ln)
            if m:
                print(f"  metadata: {m.group(1)[:300]}")
            # for fusions, also show the computation it calls
            cm = re.search(r'(?:calls|to_apply)=%?([\w.\-]+)', ln)
            if cm:
                comp = cm.group(1)
                cpat = re.compile(rf'^%?{re.escape(comp)}\s')
                for j, l2 in enumerate(lines):
                    if cpat.search(l2):
                        # print a few body ops with metadata
                        shown = 0
                        for l3 in lines[j + 1:j + 80]:
                            if "metadata=" in l3 and shown < 6:
                                mm = re.search(r'op_name="([^"]*)"', l3)
                                op = l3.strip().split("=")[0].strip()
                                if mm:
                                    print(f"    body {op[:28]:<30s} {mm.group(1)[:140]}")
                                    shown += 1
                            if l3.strip() == "}":
                                break
                        break


if __name__ == "__main__":
    main()
