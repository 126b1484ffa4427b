"""Bit-packing for binary piano rolls crossing the host link.

Piano-roll batches are binary, but the streaming train path (corpora larger
than HBM) was shipping them as float32 — 32x more host-link bytes than the
information content. On remote-TPU links (and DCN-fed pods) that link is
the streaming bottleneck, so the producer packs bits on the host
(np.packbits along the 128-pitch axis → 16 bytes/row) and the train step
unpacks on device, where the shift-and-mask is a few fused VPU ops.

The reverse direction matters just as much for SERVING: generated rolls
are binary uint8, and the device→host pull dominates per-request latency
on remote-TPU links (one axon-tunnel session measured 48.5 ms raw pull vs
3.3 ms dispatch-only for a 4×16-bar request; tunnel speed varies — the
re-driven end-to-end effect was p50 59→50 ms, 16.7→20.0 req/s).
``pack_bits`` packs on device so only 1/8 the bytes cross the link;
``unpack_bits_np`` restores them on host before MIDI encode.

Round-trips are exact for {0,1} rolls in both directions:
``unpack_bits(pack_bits_np(x)) == x`` and
``unpack_bits_np(pack_bits(x)) == x``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_bits_np(x: np.ndarray) -> np.ndarray:
    """Host-side: binary [..., P] (any dtype, nonzero == 1) → uint8
    [..., P/8]; P must be a multiple of 8 (the pitch axis is 128)."""
    if x.shape[-1] % 8 != 0:
        # explicit raise (not assert — stripped under python -O):
        # np.packbits would silently zero-pad and unpack_bits would then
        # reconstruct a WIDER last axis, corrupting shapes downstream
        raise ValueError(f"last axis {x.shape[-1]} not a multiple of 8; "
                         f"bit-pack round-trip would not be exact")
    return np.packbits(np.asarray(x) != 0, axis=-1)


def pack_bits(x: jax.Array) -> jax.Array:
    """Device-side: binary [..., P] (any dtype, nonzero == 1) → uint8
    [..., P/8], MSB first (np.unpackbits-compatible). A few VPU ops —
    negligible next to the 8x host-link saving it buys."""
    if x.shape[-1] % 8 != 0:
        raise ValueError(f"last axis {x.shape[-1]} not a multiple of 8; "
                         f"bit-pack round-trip would not be exact")
    bits = (x != 0).astype(jnp.uint8).reshape(
        *x.shape[:-1], x.shape[-1] // 8, 8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


def unpack_bits_np(packed: np.ndarray, dtype=np.uint8) -> np.ndarray:
    """Host-side inverse of ``pack_bits``: uint8 [..., P/8] → dtype
    [..., P]."""
    return np.unpackbits(np.asarray(packed), axis=-1).astype(
        dtype, copy=False)


def unpack_bits(packed: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Device-side inverse: uint8 [..., P/8] → dtype [..., P].

    Bit order matches np.packbits' default (MSB first).
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)        # MSB first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1],
                        packed.shape[-1] * 8).astype(dtype)
