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
    """Pitch-shift each example's rolls: x [B, N, T, P] (uint8 binary or
    any float), shifts [B] int (semitones, + = up) → same shape/dtype;
    pitches shifted past either edge drop out (zeros shift in — matching
    how a transposed piece would tensorize after the pitch crop).

    out[b, ..., p] = x[b, ..., p - shifts[b]] where in range, else 0.

    TPU-first formulation: the pitch axis is the 128-lane dimension, and
    a per-example DYNAMIC gather along lanes lowers to cross-lane
    shuffles (measured ~460 µs/step on c2_mxu — 16% of the whole train
    step). Instead the shift is applied as a batched matmul against a
    per-example one-hot permutation matrix M[b, q, p] = [q == p − s_b]
    — [B·N·T, 128]×[128, 128] rides the MXU (~1 GFLOP at C2-class
    shapes, tens of µs) and the out-of-range drop is implicit (no q
    matches ⇒ zero column). Exact in ALL cases (asserted bit-equal vs
    the gather semantics in tests/test_train_e2e.py): each output is a
    pure one-hot selection — bf16 operands for uint8 rolls (the
    production path; {0,1} accumulate exactly), f32 operands for float
    inputs so arbitrary values survive bit-exactly.
    """
    p_dim = x.shape[-1]
    p = jnp.arange(p_dim)
    m = (p[None, :, None] == p[None, None, :] - shifts[:, None, None])
    # dtype choice for exactness: uint8/binary rolls (the production
    # train path) ride the fast bf16 MXU path — one-hot × {0,1}
    # accumulates exactly; float inputs keep f32 operands so ARBITRARY
    # values survive bit-exactly (each output is a pure selection — one
    # nonzero product — but bf16 INPUT casting would round the values)
    mm = jnp.bfloat16 if x.dtype == jnp.uint8 else jnp.float32
    xb = x.reshape(x.shape[0], -1, p_dim).astype(mm)
    out = jnp.matmul(xb, m.astype(mm),
                     preferred_element_type=jnp.float32)
    return out.reshape(x.shape).astype(x.dtype)


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
