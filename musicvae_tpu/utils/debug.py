"""Debug modes (SURVEY §5.2): NaN checking and jit-disable, wired to config.

Races are impossible by construction (pure functional jit); these are the
numerical-sanitizer equivalents.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Context: enable jax_debug_nans / jax_disable_jit for a scoped run."""
    prev_nans = jax.config.jax_debug_nans
    prev_jit = jax.config.jax_disable_jit
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_disable_jit", disable_jit)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_disable_jit", prev_jit)
