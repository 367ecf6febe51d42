#!/usr/bin/env python
"""Multi-HOST dry run: N separate processes, jax.distributed, one global
sharded training step.

Validates the actual multi-host path (process-local data feeding via
``jax.make_array_from_process_local_data``, cross-process collectives) that
single-process virtual meshes cannot exercise. Runs on CPU — each process
contributes its devices to one global mesh, exactly as TPU hosts in a pod
slice would.

Usage: python scripts/multihost_dryrun.py [--procs 2] [--devices-per-proc 2]
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r'''
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={dpp}"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""   # keep the TPU plugin out of workers
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:{port}",
                           num_processes={procs}, process_id={pid})
import numpy as np
import jax.numpy as jnp
import optax
from xsdeepfwfm_deprecated_tpu.models import deepfwfm
from xsdeepfwfm_deprecated_tpu.parallel import embedding_sharding as es
from xsdeepfwfm_deprecated_tpu.parallel import mesh as mesh_mod
from xsdeepfwfm_deprecated_tpu.data.sharded_input import host_shard
from __graft_entry__ import _flagship

n_dev = jax.device_count()                  # global devices
mesh = mesh_mod.make_mesh(data=n_dev // 2 if n_dev >= 2 else 1,
                          model=2 if n_dev >= 2 else 1)
cfg = _flagship(feature_scale=64, deep_nodes=32, embedding_size=4)
params = jax.jit(lambda k: deepfwfm.init_params(k, cfg))(jax.random.PRNGKey(0))
spec = deepfwfm.make_embedding_spec(cfg)
exchange = {exchange!r}
lookup, table_axes, shards, batch_both = es.setup_exchange(mesh, spec, exchange)
lookup = lookup or es.make_sharded_lookup(mesh, spec)
params = mesh_mod.pad_rows_for_mesh(params, mesh, shards)
params = jax.device_put(params, mesh_mod.param_shardings(params, mesh, table_axes))
B = 8 * (n_dev if batch_both else mesh.shape["data"])
rng = np.random.default_rng(0)              # same global data on every host
xi = rng.integers(0, [s for s in cfg.feature_sizes[13:]], size=(B, 26)).astype(np.int32)
xv = rng.normal(size=(B, 13)).astype(np.float32)
y = (rng.random(B) < 0.3).astype(np.float32)

# process-local shard → global array (the multi-host data-feeding path)
if batch_both:
    s2, s1 = es.a2a_batch_sharding(mesh)
else:
    s2, _, s1 = mesh_mod.batch_shardings(mesh)
lo, hi = host_shard(B)
xi_g = jax.make_array_from_process_local_data(s2, xi[lo:hi])
xv_g = jax.make_array_from_process_local_data(s2, xv[lo:hi])
y_g = jax.make_array_from_process_local_data(s1, y[lo:hi])

opt = optax.adam(1e-3)
opt_state = opt.init(params)

@jax.jit
def step(p, o, a, v, t):
    def loss_fn(p):
        logits = deepfwfm.forward(p, a, v, cfg, lookup_fn=lookup)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, t))
    loss, g = jax.value_and_grad(loss_fn)(p)
    up, o = opt.update(g, o, p)
    return optax.apply_updates(p, up), o, loss

p2, o2, loss = step(params, opt_state, xi_g, xv_g, y_g)
print(f"WORKER {pid}: procs={procs} global_devices={{n_dev}} "
      f"mesh={{mesh.shape}} loss={{float(loss):.4f}} OK", flush=True)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--port", type=int, default=43219)
    ap.add_argument("--exchange", choices=["psum", "a2a", "a2a_grid"],
                default="psum")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in range(args.procs):
        code = WORKER.format(repo=repo, dpp=args.devices_per_proc,
                             port=args.port, procs=args.procs, pid=pid,
                             exchange=args.exchange)
        procs.append(subprocess.Popen([sys.executable, "-c", code],
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        tail = "\n".join(out.splitlines()[-4:])
        print(f"--- process {pid} (rc={p.returncode}) ---\n{tail}")
        ok &= (p.returncode == 0 and "OK" in out)
    print("MULTIHOST DRYRUN", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
