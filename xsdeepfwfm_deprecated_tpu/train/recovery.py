"""Failure detection + automatic restart-and-resume for ``fit`` (SURVEY §5.3).

The reference has no failure handling of any kind (its closest artifacts are a
CUDA-availability fallback, ``model/DeepFMs.py:153-155``, and flag-validation
``exit(1)``s). On a remote-attached TPU the realistic failure mode is a
transient device/tunnel error mid-epoch; this module supervises ``fit``:

* **detection** — any :class:`jaxlib` runtime error, ``RuntimeError`` or
  ``OSError`` escaping the training loop is classified recoverable (assertion/
  value/type errors are NOT — they are bugs and re-raise immediately);
* **recovery** — estimator device state is discarded (params, optimizer
  state, cached compiled functions) and ``fit`` restarts with
  ``resume_from=save_path``, picking up at the epoch after the last per-epoch
  checkpoint (the reference's ``torch.save``-per-epoch only ever supported a
  manual weights-only reload, ``utils/util.py:45-55``);
* bounded by ``max_restarts``; the last failure re-raises when exhausted.

Elastic multi-host recovery is out of scope (SURVEY §5.3 bar); the unit of
recovery is the process-local fit.
"""

from __future__ import annotations

from typing import Tuple, Type

from . import checkpoint as ckpt


def _recoverable_types() -> Tuple[Type[BaseException], ...]:
    types: list = [RuntimeError, OSError]
    try:  # the PJRT client surfaces device loss as XlaRuntimeError
        from jax.errors import JaxRuntimeError
        types.append(JaxRuntimeError)
    except ImportError:
        pass
    try:
        from jaxlib.xla_extension import XlaRuntimeError
        types.append(XlaRuntimeError)
    except ImportError:
        pass
    return tuple(types)


def fit_with_recovery(est, *fit_args, save_path: str, max_restarts: int = 2,
                      **fit_kwargs):
    """Run ``est.fit(*fit_args, save_path=save_path, **fit_kwargs)`` under
    restart supervision. Returns the estimator (like ``fit``)."""
    recoverable = _recoverable_types()
    attempt = 0
    while True:
        resume = fit_kwargs.pop("resume_from", None)
        if attempt > 0 and ckpt.checkpoint_exists(save_path):
            resume = save_path
        try:
            return est.fit(*fit_args, save_path=save_path,
                           resume_from=resume, **fit_kwargs)
        except recoverable as e:  # noqa: PERF203 — supervision loop
            attempt += 1
            if attempt > max_restarts:
                est._log(f"recovery: giving up after {max_restarts} restarts")
                raise
            has_ckpt = ckpt.checkpoint_exists(save_path)
            est._log(
                f"recovery: fit failed with {type(e).__name__}: {e}; "
                f"restart {attempt}/{max_restarts} "
                + (f"resuming from {save_path}" if has_ckpt
                   else "from scratch (no checkpoint written yet)"))
            # discard device state: buffers may be donated/invalid after the
            # failure; fit() re-initializes params and rebuilds the optimizer
            # template before loading the checkpoint into it
            est.params = None
            est.opt_state = None
            est._fwd = est._eval_fn = est._scan_eval_fn = None
