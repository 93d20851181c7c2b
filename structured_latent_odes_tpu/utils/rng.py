"""RNG discipline: explicit JAX key threading with a convenience chain.

The reference relies on global seeding (numpy/random/torch,
/root/reference/utils/utils.py:6-13). JAX requires explicit key threading;
``KeyChain`` provides an ergonomic sequential splitter so call sites read like
the reference's implicit-stream code while remaining purely functional.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed numpy + python RNGs (host-side data pipeline) and return a JAX key.

    Mirrors the determinism contract of the reference's ``set_seed``
    (/root/reference/utils/utils.py:6-13): host RNGs drive data shuffling and
    fold splits; the returned key drives all device-side sampling.
    """
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.key(seed)


class KeyChain:
    """Sequential key splitter: each attribute access / call yields a fresh key.

    Usage::

        kc = KeyChain(key)
        z = sample_normal(kc(), loc, scale)
        eps = jax.random.normal(kc(), shape)
    """

    def __init__(self, key: jax.Array) -> None:
        self._key = key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
