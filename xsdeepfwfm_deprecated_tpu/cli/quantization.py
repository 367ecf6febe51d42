"""Quantization CLI — counterpart of the reference ``quantization.py`` driver.

Three modes on a trained checkpoint (``-save_model_path``):

* ``-dynamic_quantization 1``  — int8 deep-tower weights, per-batch activation
  scales (reference ``quantization.py:48-64``);
* ``-static_quantization 1``   — calibration over 5 × batch_size train rows →
  fixed activation scales, weight-only int8 embeddings (reference ``:72-114``);
* ``-quantization_aware 1``    — QAT training run with fake-quant, converted
  on eval (reference ``:118-147``).

Each mode benchmarks the original and quantized model and saves the quantized
artifact under the reference's ``_dynamic_quant`` / ``_static_quant`` /
``_quant_aware`` suffixes.
"""

from __future__ import annotations

import sys

import numpy as np

from ..compression import quantization as Q
from ..config import get_parser
from ..data.datasets import get_dataset
from ..models.factory import get_model
from ..serving.benchmark import run_benchmark
from ..serving.predictor import Predictor
from ..utils.logging import get_logger


def load_quantized(path: str, cfg, mode: str = "dynamic") -> "Q.QuantizedModel":
    """Load a ``_dynamic_quant`` / ``_static_quant`` artifact back into a
    servable :class:`QuantizedModel` (counterpart of the reference reloading
    its quantized state_dicts, ``quantization.py:64,114``)."""
    import jax.numpy as jnp
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    trees = {"params_fp": {}, "emb1_q": {}, "emb2_q": {}, "deep_q": {},
             "act_scales": {}, "ffm1_q": {}, "ffm2_q": {}}

    def insert(root, keys, value):
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)

    for full_key in data.files:
        section, rest = full_key.split("::", 1)
        insert(trees[section], rest.split("/"), data[full_key])

    def listify(node):
        """dict with contiguous int keys → list (restores layer lists)."""
        if isinstance(node, dict):
            node = {k: listify(v) for k, v in node.items()}
            if node and all(k.isdigit() for k in node):
                return [node[str(i)] for i in range(len(node))]
        return node

    trees = {k: (listify(v) if v else None) for k, v in trees.items()}
    act = trees["act_scales"]
    return Q.QuantizedModel(cfg=cfg, mode=mode, params_fp=trees["params_fp"] or {},
                            emb1_q=trees["emb1_q"], emb2_q=trees["emb2_q"],
                            deep_q=trees["deep_q"], act_scales=act,
                            ffm1_q=trees["ffm1_q"], ffm2_q=trees["ffm2_q"])


def _save_quantized(qm: Q.QuantizedModel, path: str):
    import jax
    arrays = {}
    for name, tree in (("params_fp", qm.params_fp), ("emb1_q", qm.emb1_q),
                       ("emb2_q", qm.emb2_q), ("deep_q", qm.deep_q),
                       ("act_scales", qm.act_scales), ("ffm1_q", qm.ffm1_q),
                       ("ffm2_q", qm.ffm2_q)):
        if tree is None:
            continue
        for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = name + "::" + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in p)
            arrays[key] = np.asarray(leaf)
    np.savez(path + ".npz", **arrays)


def main(argv=None):
    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    pars = get_parser().parse_args(argv)
    logger = get_logger("Quantization")
    logger.info(pars)

    field_size, train_dict, valid_dict, test_dict = get_dataset(
        pars.dataset, twitter_category=pars.twitter_category)

    if not pars.save_model_path or pars.save_model_path in ("0", 0):
        logger.info("no model path given: -save_model_path")
        sys.exit(1)

    model = get_model(field_size=field_size, feature_sizes=train_dict["feature_sizes"],
                      pars=pars, logger=logger)
    model.load(pars.save_model_path, strict=not pars.prune)

    logger.info("Original model:")
    model.print_size_of_model()
    model.run_benchmark(test_dict["index"], test_dict["value"], test_dict["label"])

    if pars.dynamic_quantization:
        qm = Q.convert(model.params, model.mcfg, mode="dynamic")
        logger.info("Dynamic Quantization model:")
        logger.info("\tSize (MB):\t" + str(qm.size_bytes() / 1e6))
        run_benchmark(Predictor(qm), test_dict["index"], test_dict["value"],
                      test_dict["label"], logger=logger)
        _save_quantized(qm, pars.save_model_path + "_dynamic_quant")

    if pars.static_quantization:
        calib = model.tcfg.batch_size * 5      # reference :94
        xi = np.asarray(train_dict["index"][:calib], np.int32)
        xv = np.asarray(train_dict["value"][:calib], np.float32)
        scales = Q.calibrate(model.params, model.mcfg, xi, xv,
                             n_batches=5, batch_size=model.tcfg.batch_size)
        logger.info("Post Static Quantization: Calibration done")
        qm = Q.convert(model.params, model.mcfg, mode="static", act_scales=scales)
        logger.info("Post Static Quantization model:")
        logger.info("\tSize (MB):\t" + str(qm.size_bytes() / 1e6))
        run_benchmark(Predictor(qm), test_dict["index"], test_dict["value"],
                      test_dict["label"], logger=logger)
        _save_quantized(qm, pars.save_model_path + "_static_quant")

    if pars.quantization_aware:
        qat_model = get_model(field_size=field_size,
                              feature_sizes=train_dict["feature_sizes"],
                              pars=pars, logger=logger, quantization_aware=True)
        qat_model.fit(train_dict["index"], train_dict["value"], train_dict["label"],
                      valid_dict["index"], valid_dict["value"], valid_dict["label"],
                      prune=bool(pars.prune), prune_fm=bool(pars.prune_fm),
                      prune_r=bool(pars.prune_r), prune_deep=bool(pars.prune_deep),
                      emb_r=pars.emb_r, emb_corr=pars.emb_corr)
        qat_model.save(pars.save_model_path + "_quant_aware")
        logger.info("Quantization Aware model:")
        qm = Q.convert(qat_model.params, qat_model.mcfg, mode="qat")
        logger.info("\tSize (MB):\t" + str(qm.size_bytes() / 1e6))
        run_benchmark(Predictor(qm), test_dict["index"], test_dict["value"],
                      test_dict["label"], logger=logger)


if __name__ == "__main__":
    main()
