"""Positional CLI argument parsing with defaults.

Maps readarg (default.f90:40-78): drivers take positional args and fall
back to defaults, e.g. `crs_ising.py C 6 64 24 1`.
"""

from __future__ import annotations

import sys

__all__ = ["readarg", "print_config"]


def readarg(pos: int, default, cast=None):
    """Positional CLI argument `pos` (1-based) with a default; the cast is
    inferred from the default's type unless given."""
    if cast is None:
        cast = type(default)
    if len(sys.argv) > pos:
        return cast(sys.argv[pos])
    return default


def print_config(**kv) -> None:
    """Driver banner (pattern of test_crs_*.f90 config summaries)."""
    import jax

    for k, v in kv.items():
        print(f"   {k:<10s}: {v}")
    print(f"   {'device':<10s}: {jax.devices()[0]}")
    print(f"   {'n devices':<10s}: {len(jax.devices())}")
