"""Deterministic synthetic inputs (seeded, pure functions of row id).

Everything here is derived with counter-based hashing (splitmix64) so the
same (seed, id) always yields the same bytes regardless of partitioning,
ordering or parallelism — the precondition for the byte-identical golden
tests (FIXTURES.md §Golden outputs) and for distributed generation at
bench scale.
"""
