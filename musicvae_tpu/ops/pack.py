"""Bit-packing for binary piano rolls crossing the host link.

Piano-roll batches are binary, but the streaming train path (corpora larger
than HBM) was shipping them as float32 — 32x more host-link bytes than the
information content. On remote-TPU links (and DCN-fed pods) that link is
the streaming bottleneck, so the producer packs bits on the host
(np.packbits along the 128-pitch axis → 16 bytes/row) and the train step
unpacks on device, where the shift-and-mask is a few fused VPU ops.

Round-trip is exact for {0,1} rolls: unpack_bits(pack_bits_np(x)) == x.
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


def unpack_bits(packed: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Device-side inverse: uint8 [..., P/8] → dtype [..., P].

    Bit order matches np.packbits' default (MSB first).
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)        # MSB first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1],
                        packed.shape[-1] * 8).astype(dtype)
