"""Shared helpers for the stats_* operator modules (split round 9)."""

from __future__ import annotations


def _check_e4_scale(scale: int) -> None:
    """Operators that rescale e-``scale`` ticks to e4 output with the
    integer factor ``10000 // scale`` require scale to divide 10000
    exactly (any divisor works — 1, 10, 100, 16, 625, … — though powers
    of 10 are the conventional choice) — any other value would silently
    mis-scale the output."""
    if scale <= 0 or 10000 % scale != 0:
        raise ValueError(f"scale must divide 10000; got {scale}")

