#!/usr/bin/env python
"""Wire-or-retire measurement for the Pallas FwFM kernel (VERDICT r3 #3/#4:
a kernel nothing calls is shelf inventory). Marginal-protocol on-chip A/B of
``ops.pallas.fwfm.fwfm_second_order_pallas`` vs the XLA contraction
(``ops.interactions.fwfm_second_order``) at the product shapes (F=39, E=10;
train b=2048 and serving b=8192), standalone AND embedded in the full
DeepFwFM forward. The decision + numbers land in RESULTS.md.

Usage: python scripts/measure_pallas_fwfm.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.ops import interactions as inter_ops
    from xsdeepfwfm_deprecated_tpu.ops.pallas import fwfm as pf
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    out = {}
    for b in (2048, 8192):
        embs = [jax.device_put(rng.normal(size=(b, 39, 10)).astype(np.float32))
                for _ in range(16)]
        r = jax.device_put(rng.normal(size=(39, 39)).astype(np.float32))

        # correctness first
        got = pf.fwfm_second_order_pallas(embs[0], r)
        want = inter_ops.fwfm_second_order(embs[0], r)
        err = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9))

        dt_x = marginal_timeit(lambda _, e: inter_ops.fwfm_second_order(e, r),
                               None, [(e,) for e in embs])
        dt_p = marginal_timeit(
            lambda _, e: pf.fwfm_second_order_pallas(e, r),
            None, [(e,) for e in embs])
        out[f"b{b}"] = {"xla_us": round(dt_x * 1e6, 1),
                        "pallas_us": round(dt_p * 1e6, 1),
                        "pallas_speedup": round(dt_x / max(dt_p, 1e-12), 2),
                        "rel_err": err}
        print(json.dumps({f"b{b}": out[f"b{b}"]}), flush=True)

    verdict = ("WIRE" if all(v["pallas_speedup"] > 1.1 and v["rel_err"] < 1e-5
                             for v in out.values()) else "RETIRE")
    print(json.dumps({"decision": verdict, **out}))


if __name__ == "__main__":
    main()
