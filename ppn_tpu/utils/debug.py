"""Debug/safety toggles (SURVEY.md §5 sanitizers row).

The reference has no sanitizers (single-process Python). TPU-native
equivalents: NaN trapping and transfer guards, enabled in CI or on demand.
"""

from __future__ import annotations

import contextlib

import jax


def enable_checks(nans: bool = True, disable_jit: bool = False) -> None:
    """Globally enable debug checks (call before building jitted fns)."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


@contextlib.contextmanager
def checking(nans: bool = True):
    """Scoped NaN checking."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
