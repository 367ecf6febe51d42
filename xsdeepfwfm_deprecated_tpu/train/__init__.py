from .trainer import DeepFMEstimator, make_optimizer, make_train_step, make_eval_fn  # noqa: F401
