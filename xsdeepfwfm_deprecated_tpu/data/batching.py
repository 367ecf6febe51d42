"""Host-side batching: dense arrays → fixed-shape device batches.

TPU-native replacement for the reference's per-batch LongTensor/FloatTensor
slicing + H2D copies (``model/DeepFMs.py:619-623``). Every batch has a static
shape — the trailing partial batch is padded and carries a validity mask so the
jitted step compiles exactly once. Labels/values stay float32, indices int32.
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np


def shuffle_arrays(rng: np.random.Generator, *arrays: np.ndarray) -> Tuple[np.ndarray, ...]:
    """One shared permutation over N arrays (reference fit(:699-702))."""
    n = arrays[0].shape[0]
    perm = rng.permutation(n)
    return tuple(a[perm] for a in arrays)


def iter_batches(index: np.ndarray, value: np.ndarray, label: np.ndarray,
                 batch_size: int, *, drop_remainder: bool = False,
                 pad_to_full: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Yield dict batches {xi, xv, y, mask, n_valid}.

    ``mask`` is 1.0 for real rows, 0.0 for pad rows; padded rows replicate row 0
    (safe indices). Static shapes keep XLA recompilation at one.
    """
    n = index.shape[0]
    for start in range(0, n, batch_size):
        end = min(n, start + batch_size)
        xi = index[start:end]
        xv = value[start:end]
        y = label[start:end]
        n_valid = end - start
        if n_valid < batch_size:
            if drop_remainder:
                return
            if pad_to_full:
                pad = batch_size - n_valid
                xi = np.concatenate([xi, np.repeat(xi[:1], pad, axis=0)], axis=0)
                xv = np.concatenate([xv, np.repeat(xv[:1], pad, axis=0)], axis=0)
                y = np.concatenate([y, np.zeros(pad, dtype=y.dtype)], axis=0)
        mask = np.zeros(xi.shape[0], dtype=np.float32)
        mask[:n_valid] = 1.0
        yield {"xi": xi.astype(np.int32), "xv": xv.astype(np.float32),
               "y": y.astype(np.float32), "mask": mask, "n_valid": n_valid}


def pad_batch_count(n: int, batch_size: int) -> int:
    return -(-n // batch_size)


def prefetch_to_device(batch_iter, size: int = 2, shardings=None):
    """Double-buffered device prefetch: overlap H2D transfer with compute.

    The reference pays a synchronous H2D copy per batch
    (``model/DeepFMs.py:619-623``); here the next batch's transfer is issued
    while the current step runs. Yields dict batches whose array values are
    already on the default device — or, when ``shardings`` (a dict mapping
    batch keys to ``jax.sharding.Sharding``) is given, already laid out across
    the mesh so the jitted step sees its expected input shardings with no
    resharding collective.
    """
    import collections
    import jax

    queue = collections.deque()
    shardings = shardings or {}

    def put(b):
        queue.append({k: (jax.device_put(v, shardings.get(k))
                          if isinstance(v, np.ndarray) else v)
                      for k, v in b.items()})

    it = iter(batch_iter)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
