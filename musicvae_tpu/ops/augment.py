"""On-device data augmentation for piano-roll training.

The reference trains on rolls exactly as tensorized; transpose
augmentation is the standard extra for bar-VAE training (every piece is
equally valid in any key, and the pitch crop leaves headroom), and on TPU
it is effectively free: a per-example gather along the pitch axis fused
into the same device program as the train step — no host involvement, no
second copy of the corpus, exact resume determinism (the shift PRNG hangs
off the checkpointed per-step key chain).

Enabled with ``TrainSpec.transpose_aug = K`` / ``train --transpose-aug K``
(uniform shift in [-K, +K] semitones per example per step). For cond
models the chord/key labels rotate WITH the shift
(``rotate_chord_classes`` — the ``root*2 + minor`` encoding of
midi/labels.py transposes as root → (root+s) mod 12 with the quality bit
untouched), so the conditioning stays consistent with the shifted
content; non-24-class label spaces are refused (unknown encoding,
trainer._train_step_body raises).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transpose_rolls(x: jax.Array, shifts: jax.Array) -> jax.Array:
    """Pitch-shift each example's rolls: x [B, N, T, P] (any dtype),
    shifts [B] int (semitones, + = up) → same shape/dtype; pitches
    shifted past either edge drop out (zeros shift in — matching how a
    transposed piece would tensorize after the pitch crop).

    out[b, ..., p] = x[b, ..., p - shifts[b]] where in range, else 0.
    """
    p_dim = x.shape[-1]
    idx = jnp.arange(p_dim)[None, :] - shifts[:, None]          # [B, P]
    valid = (idx >= 0) & (idx < p_dim)
    idxc = jnp.clip(idx, 0, p_dim - 1)
    out = jnp.take_along_axis(x, idxc[:, None, None, :], axis=-1)
    return out * valid[:, None, None, :].astype(x.dtype)


def random_shifts(key: jax.Array, batch: int, max_shift: int) -> jax.Array:
    """Uniform per-example shifts in [-max_shift, +max_shift]."""
    return jax.random.randint(key, (batch,), -max_shift, max_shift + 1)


def rotate_chord_classes(classes: jax.Array,
                         shifts: jax.Array) -> jax.Array:
    """Transpose ``root*2 + minor`` chord/key classes (midi/labels.py)
    by ``shifts`` semitones: root moves (root+s) mod 12 (octave
    equivalence), the major/minor quality bit is untouched. Works for
    negative shifts (jnp's mod is non-negative for a positive divisor);
    shapes broadcast (e.g. chord [B,N] against shifts [B,1])."""
    return ((classes // 2 + shifts) % 12) * 2 + classes % 2
