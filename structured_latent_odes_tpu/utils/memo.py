"""Bounded LRU memo for jitted step builders.

The step-builder memos (train/svi.py, train/ensemble.py, parallel/train.py)
retain jitted closures — and through them compiled executables, each of which
pins device memory and host mmap regions (XLA:CPU executables count against
``vm.max_map_count``; the round-3 slow-tier segfault history, commit ee2c923).
The intended key space in any real process is tiny (one or two recipes), but a
long-lived sweep/driver process walking a knob grid (lr grids, prior_lr_mult
variants) would otherwise grow the memo without bound. A small LRU keeps the
hot path (repeat builds of the same recipe) allocation-free while guaranteeing
an eviction path for the pathological case.

Capacity 8 is deliberate headroom: the largest legitimate concurrent working
set observed is 3 builders (train + eval + refit variants of one recipe).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable


class BoundedMemo:
    """An OrderedDict-backed LRU with dict-ish get/set/clear surface."""

    def __init__(self, maxsize: int = 8):
        self.maxsize = int(maxsize)
        self._d: OrderedDict = OrderedDict()

    def get(self, key: Hashable, default: Any = None) -> Any:
        try:
            self._d.move_to_end(key)
        except KeyError:
            return default
        return self._d[key]

    def __setitem__(self, key: Hashable, value: Any) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, key: Hashable) -> bool:
        return key in self._d

    def clear(self) -> None:
        self._d.clear()
