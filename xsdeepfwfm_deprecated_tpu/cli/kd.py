"""Knowledge-distillation CLI — counterpart of the reference ``kd.py``.

Loads a trained teacher from ``-save_model_path``, trains a smaller student
(400 nodes × 2 hidden layers, reference ``kd.py:40-43``) against its cached
logits with the DeepLight KD loss, then benchmarks both and reports the size
ratio (reference ``kd.py:60-74``).
"""

from __future__ import annotations

import dataclasses
import sys

from ..config import configs_from_args, get_parser
from ..data.datasets import get_dataset
from ..models.factory import get_model
from ..utils.logging import get_logger

STUDENT_DEEP_NODES = 400   # reference kd.py:40
STUDENT_H_DEPTH = 2        # reference kd.py:41


def main(argv=None):
    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    pars = get_parser().parse_args(argv)
    logger = get_logger("Knowledge Distillation")
    logger.info(pars)

    if not pars.save_model_path or pars.save_model_path in ("0", 0):
        logger.error("no model path given: -save_model_path")
        sys.exit(1)

    field_size, train_dict, valid_dict, test_dict = get_dataset(
        pars.dataset, twitter_category=pars.twitter_category)

    teacher = get_model(field_size=field_size, feature_sizes=train_dict["feature_sizes"],
                        pars=pars, logger=logger)
    teacher.load(pars.save_model_path, strict=not pars.prune)

    mcfg, tcfg = configs_from_args(pars, field_size, train_dict["feature_sizes"])
    student_mcfg = dataclasses.replace(mcfg, deep_nodes=STUDENT_DEEP_NODES,
                                       h_depth=STUDENT_H_DEPTH)
    from ..train.trainer import DeepFMEstimator
    student = DeepFMEstimator(student_mcfg, tcfg, logger=logger)

    logger.info("Train student model")
    student.fit(train_dict["index"], train_dict["value"], train_dict["label"],
                valid_dict["index"], valid_dict["value"], valid_dict["label"],
                prune=bool(pars.prune), prune_fm=bool(pars.prune_fm),
                prune_r=bool(pars.prune_r), prune_deep=bool(pars.prune_deep),
                emb_r=pars.emb_r, emb_corr=pars.emb_corr,
                save_path=pars.save_model_path + "_kd", teacher_model=teacher)

    logger.info("Original model:")
    f = teacher.print_size_of_model()
    teacher.run_benchmark(test_dict["index"], test_dict["value"], test_dict["label"])

    logger.info("Student model:")
    s = student.print_size_of_model()
    logger.info("\t{0:.2f} times smaller".format(f / s))
    student.run_benchmark(test_dict["index"], test_dict["value"], test_dict["label"])


if __name__ == "__main__":
    main()
