"""Weak-scaling benchmark: embedding lookup + FwFM scoring, 1 chip → N devices.

BASELINE.md target: ≥90% weak-scaling efficiency on the embedding-lookup +
FwFM-scoring path from 1 chip to a multi-host slice. This harness holds the
per-device batch constant, grows the mesh, and reports
``efficiency(n) = t(1) / t(n)`` (ideal weak scaling keeps step time flat).

Runs on whatever devices exist — real TPU slice or the virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8`` for CI smoke runs;
CPU numbers validate the harness, not the hardware).

Usage::

    python benchmarks/weak_scaling.py [--per-device-batch 4096] [--mode score|train]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def run(per_device_batch: int = 4096, mode: str = "score",
        feature_scale: int = 1, tries: int = 10, exchange: str = "a2a_grid",
        force_cpu: bool = False):
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.parallel import embedding_sharding as es
    from xsdeepfwfm_deprecated_tpu.parallel import mesh as mesh_mod
    from xsdeepfwfm_deprecated_tpu.utils.profiling import simple_timeit

    n_total = jax.device_count()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    cfg = _flagship(feature_scale=feature_scale)
    spec = deepfwfm.make_embedding_spec(cfg)
    results = {}

    for n in sizes:
        model_ax = 2 if n >= 2 else 1
        data_ax = n // model_ax
        mesh = mesh_mod.make_mesh(data=data_ax, model=model_ax,
                                  devices=jax.devices()[:n])
        params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
        lookup, table_axes, shards, batch_both = es.setup_exchange(
            mesh, spec, exchange)
        lookup = lookup or es.make_sharded_lookup(mesh, spec)
        params = mesh_mod.pad_rows_for_mesh(params, mesh, shards)
        params = jax.device_put(params, mesh_mod.param_shardings(
            params, mesh, table_axes))
        b = per_device_batch * (n if batch_both else data_ax)
        rng = np.random.default_rng(0)
        xi = rng.integers(0, [s for s in cfg.feature_sizes[13:]],
                          size=(b, 26)).astype(np.int32)
        xv = rng.normal(size=(b, 13)).astype(np.float32)
        y = (rng.random(b) < 0.3).astype(np.float32)
        if batch_both:
            s2, s1 = es.a2a_batch_sharding(mesh)
        else:
            s2, _, s1 = mesh_mod.batch_shardings(mesh)
        xi_d = jax.device_put(jnp.asarray(xi), s2)
        xv_d = jax.device_put(jnp.asarray(xv), s2)
        y_d = jax.device_put(jnp.asarray(y), s1)

        if mode == "score":
            fn = jax.jit(lambda p, a, v: deepfwfm.forward(p, a, v, cfg,
                                                          lookup_fn=lookup))
            t = simple_timeit(fn, params, xi_d, xv_d, tries=tries)
        else:
            opt = optax.adam(1e-3)
            opt_state = opt.init(params)

            @jax.jit
            def step(p, o, a, v, t_):
                def loss_fn(p):
                    logits = deepfwfm.forward(p, a, v, cfg, lookup_fn=lookup)
                    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, t_))
                loss, g = jax.value_and_grad(loss_fn)(p)
                up, o = opt.update(g, o, p)
                return optax.apply_updates(p, up), o, loss

            def run_step():
                nonlocal params, opt_state
                params, opt_state, loss = step(params, opt_state, xi_d, xv_d, y_d)
                return loss

            t = simple_timeit(run_step, tries=tries)

        results[n] = {"devices": n, "mesh": f"{data_ax}x{model_ax}",
                      "global_batch": b, "step_ms": t * 1e3,
                      "examples_per_s": b / t}

    t1 = results[sizes[0]]["step_ms"]
    for n in sizes:
        results[n]["weak_scaling_efficiency"] = t1 / results[n]["step_ms"]
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=4096)
    ap.add_argument("--mode", choices=["score", "train"], default="score")
    ap.add_argument("--exchange", choices=["psum", "a2a", "a2a_grid"],
                default="a2a_grid")
    ap.add_argument("--feature-scale", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual-mesh runs; never "
                         "attaches the TPU tunnel)")
    args = ap.parse_args()
    results = run(args.per_device_batch, args.mode, args.feature_scale,
                  exchange=args.exchange, force_cpu=args.cpu)
    for n, r in results.items():
        print(json.dumps(r))


if __name__ == "__main__":
    main()
