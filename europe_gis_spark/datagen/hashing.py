"""Counter-based deterministic hashing (splitmix64), vectorized numpy.

Used instead of stateful RNGs so field values are pure functions of
(seed, row_id): generation is order- and partitioning-independent, which
is what makes distributed datagen reproducible byte-for-byte.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    with np.errstate(over="ignore"):
        z = (x + _U64(0x9E3779B97F4A7C15)) & _MASK
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> _U64(31))


def h64(ids, seed: int, stream: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of (id, seed, stream)."""
    ids = np.asarray(ids, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = ids ^ (_U64(seed & 0xFFFFFFFFFFFFFFFF) * _U64(0xD6E8FEB86659FD93))
        mixed = mixed ^ (_U64(stream) << _U64(32))
    return splitmix64(mixed)


def uniform(ids, seed: int, stream: int = 0) -> np.ndarray:
    """Deterministic float64 in [0, 1)."""
    return h64(ids, seed, stream).astype(np.float64) / 18446744073709551616.0


def randint(ids, seed: int, stream: int, lo: int, hi: int) -> np.ndarray:
    """Deterministic int64 in [lo, hi)."""
    return (h64(ids, seed, stream) % np.uint64(hi - lo)).astype(np.int64) + lo
