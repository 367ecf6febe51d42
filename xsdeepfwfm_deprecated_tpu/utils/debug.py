"""Numerical-debugging hooks: NaN checks and checkified forwards.

The reference has no sanitizers (SURVEY §5.2); these are the idiomatic JAX
stand-ins: ``jax.debug_nans`` for trap-on-NaN and ``checkify`` for
value-checked jitted functions.
"""

from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def nan_debugging(enable: bool = True):
    """Trap NaNs/Infs produced by any jitted computation inside the scope."""
    prev = bool(jax.config.jax_debug_nans)
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkified(fn, errors=checkify.float_checks):
    """Wrap a function so float errors (nan/inf/div) surface as checkify
    errors instead of silent propagation. Returns (err, out) like checkify."""
    return checkify.checkify(fn, errors=errors)
