"""Shared neural building blocks (flax.linen), TPU-first shapes.

Design notes (vs the reference's torch modules, SURVEY §2.1 #4/#7/#8):
- The pitch axis stays 128-wide end to end — the TPU lane dimension — so
  every conv/matmul tiles cleanly onto the MXU; pitch-crop is a loss mask,
  not a shape change (SEMANTICS.md §5).
- Compute dtype is configurable (bfloat16 by default, fp32 params); conv
  stacks are stride-2 pyramids 96×128 → 3×4 so the flatten→dense latent
  heads stay small (~1M params total for C1, per BASELINE config 1).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _dtype(name: str) -> jnp.dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class _FirstConvPallas(nn.Module):
    """Drop-in for the trunk's first nn.Conv (+gelu) via the banded-MXU
    Pallas kernel (ops/conv1_pallas.py). Declares the IDENTICAL parameter
    pytree ({kernel: [3,3,1,C], bias: [C]}) under the same module name, so
    checkpoints are interchangeable with the XLA path.

    Gradient contract (conv1_pallas module docstring): the kernel's VJP
    returns dx = 0 — this layer must only ever see raw rolls / binarized
    feedback as input (true for every current caller: ConvTrunk layer 0),
    never a differentiated activation."""

    features: int
    out_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, 96, 128, 1]
        from musicvae_tpu.ops.conv1_pallas import first_conv_s2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return first_conv_s2(x[..., 0], kernel[:, :, 0, :], bias,
                             gelu=True, out_dtype=_dtype(self.out_dtype))


class ConvTrunk(nn.Module):
    """Stride-2 conv pyramid over a single bar roll: [B,T,P,1] → [B,F]."""

    channels: Sequence[int]
    dtype: str = "bfloat16"
    first_conv_pallas: bool = False   # ModelSpec.use_pallas_conv1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = _dtype(self.dtype)
        h = x.astype(dt)
        # explicit symmetric (1,1) padding: XLA's stride-2 SAME pads (0,1),
        # which would misalign checkpoint-parity with torch-convention
        # reference models (checkpoints/torch_convert.py)
        for i, ch in enumerate(self.channels):
            if (i == 0 and self.first_conv_pallas
                    and h.shape[1:] == (96, 128, 1)):
                # gelu is fused into the kernel; param paths unchanged
                h = _FirstConvPallas(ch, self.dtype, name="Conv_0")(h)
                continue
            h = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        dtype=dt, param_dtype=jnp.float32,
                        name=f"Conv_{i}")(h)
            h = nn.gelu(h)
        return h.reshape(h.shape[0], -1)


def space_to_depth(x: jax.Array, pt: int, pp: int) -> jax.Array:
    """[B, T, P] → [B, T/pt, P/pp, pt·pp]: fold (pt × pp) patches into
    channels. The MXU-first input layout: a [96,128] binary bar has ONE
    channel, so its first conv contracts over 3·3·1 = 9 elements against
    the MXU's 128-wide tiles (docs/PALLAS_NOTES.md pinned this as the MFU
    ceiling); patchified, the first contraction is 3·3·pt·pp ≥ 1152."""
    b, t, p = x.shape
    if t % pt or p % pp:
        raise ValueError(f"patch {(pt, pp)} does not tile a [{t}, {p}] "
                         f"bar (ModelSpec.patch_size must divide "
                         f"steps_per_bar x num_pitches)")
    x = x.reshape(b, t // pt, pt, p // pp, pp)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, t // pt, p // pp, pt * pp)


def depth_to_space(x: jax.Array, pt: int, pp: int) -> jax.Array:
    """Exact inverse of space_to_depth: [B, t0, p0, pt·pp] → [B, t0·pt,
    p0·pp]. The decoder-head mirror: the parity head's final 16→1-channel
    deconv (contraction 144, output depth 1 — the other MXU-starved op)
    becomes a full-width conv emitting pt·pp logit channels, unfolded."""
    b, t0, p0, c = x.shape
    x = x.reshape(b, t0, p0, pt, pp).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, t0 * pt, p0 * pp)


class PatchTrunk(nn.Module):
    """MXU-first encoder trunk (the round-4 `stem="patch"` variant):
    space-to-depth patchify [B,T,P,1] → [B,T/pt,P/pp,pt·pp], then a
    wide-channel conv stack (first layer stride 1, the rest stride 2).
    Every matmul's contraction dim is ≥ 9·pt·pp and every output depth a
    multiple of 128 — full MXU tiles end to end, vs the parity trunk's
    1-channel first conv (contraction 9). Opt-in: the parity-exact
    ConvTrunk stays the default (ModelSpec.stem)."""

    channels: Sequence[int]
    patch: Tuple[int, int] = (8, 16)
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pt, pp = self.patch
        dt = _dtype(self.dtype)
        t = x.shape[1]
        if t % pt:
            # bar-adapting meters (7/8 → 84 steps): zero-pad the time
            # axis to a whole number of patches — empty steps at the bar
            # end, semantically silence (config.meter_grid round 5)
            x = jnp.pad(x, ((0, 0), (0, pt - t % pt), (0, 0), (0, 0)))
        h = space_to_depth(x[..., 0], pt, pp).astype(dt)
        for i, ch in enumerate(self.channels):
            h = nn.Conv(ch, (3, 3),
                        strides=(1, 1) if i == 0 else (2, 2),
                        padding=((1, 1), (1, 1)),
                        dtype=dt, param_dtype=jnp.float32,
                        name=f"Conv_{i}")(h)
            h = nn.gelu(h)
        return h.reshape(h.shape[0], -1)


class PatchHead(nn.Module):
    """MXU-first decoder head: dense → coarse [t0,p0] grid → wide
    ConvTranspose stack → stride-1 conv emitting pt·pp logit channels →
    depth-to-space to [T,P]. Mirrors PatchTrunk (see its docstring)."""

    channels: Sequence[int]                    # e.g. (512, 256, 256)
    patch: Tuple[int, int] = (8, 16)
    steps_per_bar: int = 96
    num_pitches: int = 128
    dtype: str = "bfloat16"
    logits_dtype: str = "float32"

    @nn.compact
    def __call__(self, v: jax.Array) -> jax.Array:
        pt, pp = self.patch
        dt = _dtype(self.dtype)
        n_up = len(self.channels) - 1
        # ceil-pad-crop (round 5, bar-adapting meters): emit the smallest
        # tiling grid covering [steps_per_bar, num_pitches] and slice the
        # surplus off after depth-to-space — a no-op for shapes that tile
        # exactly (96/120 steps), so pre-round-5 numerics are unchanged
        t0 = -(-self.steps_per_bar // (pt * 2 ** n_up))
        p0 = -(-self.num_pitches // (pp * 2 ** n_up))
        h = nn.Dense(t0 * p0 * self.channels[0], dtype=dt,
                     param_dtype=jnp.float32)(v.astype(dt))
        h = nn.gelu(h)
        h = h.reshape(h.shape[0], t0, p0, self.channels[0])
        for ch in self.channels[1:]:
            h = nn.ConvTranspose(ch, (3, 3), strides=(2, 2), padding="SAME",
                                 transpose_kernel=True,
                                 dtype=dt, param_dtype=jnp.float32)(h)
            h = nn.gelu(h)
        h = nn.Conv(pt * pp, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)),
                    dtype=dt, param_dtype=jnp.float32)(h)
        out = depth_to_space(h, pt, pp)
        return out[:, :self.steps_per_bar, :self.num_pitches].astype(
            _dtype(self.logits_dtype))


class BarFeat(nn.Module):
    """Per-bar feature vector for GRU inputs / prev-bar conditioning."""

    feat_dim: int
    channels: Sequence[int]
    dtype: str = "bfloat16"
    first_conv_pallas: bool = False
    stem: str = "conv"                  # ModelSpec.stem
    patch: Tuple[int, int] = (8, 16)

    @nn.compact
    def __call__(self, bar: jax.Array) -> jax.Array:
        # bar: [B, T, P] binary roll
        if self.stem == "patch":
            h = PatchTrunk(self.channels, self.patch,
                           self.dtype)(bar[..., None])
        else:
            h = ConvTrunk(self.channels, self.dtype,
                          self.first_conv_pallas)(bar[..., None])
        h = nn.Dense(self.feat_dim, dtype=_dtype(self.dtype),
                     param_dtype=jnp.float32)(h)
        return nn.tanh(h)


class GaussianHead(nn.Module):
    """Dense → (mu, logvar); logvar soft-clamped for stability."""

    z_dim: int
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, h: jax.Array) -> Tuple[jax.Array, jax.Array]:
        dt = _dtype(self.dtype)
        out = nn.Dense(2 * self.z_dim, dtype=dt,
                       param_dtype=jnp.float32)(h)
        mu, logvar = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        logvar = 8.0 * jnp.tanh(logvar / 8.0)  # keep exp() sane
        return mu, logvar


class BarDecoderHead(nn.Module):
    """Vector → single-bar logits: [B,D] → [B,T,P] (deconv pyramid)."""

    channels: Sequence[int]                    # e.g. (128, 128, 64, 32, 16)
    steps_per_bar: int = 96
    num_pitches: int = 128
    dtype: str = "bfloat16"
    logits_dtype: str = "float32"              # ModelSpec.logits_dtype

    @nn.compact
    def __call__(self, v: jax.Array) -> jax.Array:
        dt = _dtype(self.dtype)
        n_up = len(self.channels)
        # ceil-pad-crop for bar-adapting meters (see PatchHead): exact
        # tilings (96 steps / 5 ups) keep pre-round-5 numerics bit-for-bit
        t0 = -(-self.steps_per_bar // (2 ** n_up))
        p0 = -(-self.num_pitches // (2 ** n_up))
        h = nn.Dense(t0 * p0 * self.channels[0], dtype=dt,
                     param_dtype=jnp.float32)(v.astype(dt))
        h = nn.gelu(h)
        h = h.reshape(h.shape[0], t0, p0, self.channels[0])
        # transpose_kernel=True == gradient-of-conv semantics, the exact
        # counterpart of a torch ConvTranspose2d — required for the
        # checkpoint converter's weight-level parity (torch_convert.py).
        for ch in self.channels[1:]:
            h = nn.ConvTranspose(ch, (3, 3), strides=(2, 2), padding="SAME",
                                 transpose_kernel=True,
                                 dtype=dt, param_dtype=jnp.float32)(h)
            h = nn.gelu(h)
        # final x2 upsample to (T, P) with a 1-channel head
        h = nn.ConvTranspose(1, (3, 3), strides=(2, 2), padding="SAME",
                             transpose_kernel=True,
                             dtype=dt, param_dtype=jnp.float32)(h)
        # logits_dtype="bfloat16" halves the HBM footprint of the step's
        # largest activation; every consumer (BCE loss, binarize) upcasts
        # to f32 inside its own fusion
        return h[:, :self.steps_per_bar, :self.num_pitches, 0].astype(
            _dtype(self.logits_dtype))


class AttnStack(nn.Module):
    """Pre-LN transformer over the bar axis — the non-recurrent temporal
    core (``ModelSpec.temporal="attn"``).

    Why it exists (docs/PALLAS_NOTES.md round-4 ceiling attribution): the
    patch-stem family's remaining MFU gap is the GRU scans — [B,H]-vector
    recurrences that serialize N bars of small matmuls between the big
    batched convs. Attention removes the recurrence: teacher-forced decode
    becomes ONE set of [B·N]-batched MXU matmuls over the whole window
    (``__call__`` with a causal mask), and only closed-loop generation
    keeps a scan — ``step``, an O(1)-per-bar KV-cache update, the standard
    TPU decode layout.

    Two entry points, one parameter set (the BarDecoder teacher/step
    pattern, models/vae.py module docstring):

    - ``__call__(u)``: [B,N,D] → [B,N,H], all bars at once. Causal mask
      when ``causal`` (decoder), full attention otherwise (encoder).
    - ``step(cache, u, pos, start)``: one bar. ``cache`` is a per-layer
      tuple of [B,n,H] K/V tensors written in place at ``pos``
      (lax.dynamic_update_slice); attention reads positions
      [start, pos] only, so a reset=1 bar starts a fresh segment —
      the attention analog of the GRU h0 re-init.

    Positions are SEGMENT-RELATIVE (``pos - start``): bar k of a segment
    gets pos_emb[k] whether the segment begins the sweep or follows a
    phrase reset. This makes the GRU family's seam semantics exact here
    too: a sweep continued across a reset equals a fresh sweep seeded
    with the previous segment's last bar (tested in test_models.py).
    Softmax runs in float32 regardless of compute dtype.
    """

    hidden: int
    num_layers: int = 2
    heads: int = 4
    max_len: int = 128
    causal: bool = True
    dtype: str = "bfloat16"

    def setup(self):
        if self.hidden % self.heads:
            raise ValueError(f"attn hidden {self.hidden} not divisible by "
                             f"{self.heads} heads")
        dt = _dtype(self.dtype)
        self._dt = dt
        dense = lambda f: nn.Dense(f, dtype=dt, param_dtype=jnp.float32)
        self.inp = dense(self.hidden)
        self.pos_emb = self.param("pos_emb", nn.initializers.normal(0.02),
                                  (self.max_len, self.hidden), jnp.float32)
        self.ln1 = [nn.LayerNorm(dtype=dt, param_dtype=jnp.float32)
                    for _ in range(self.num_layers)]
        self.ln2 = [nn.LayerNorm(dtype=dt, param_dtype=jnp.float32)
                    for _ in range(self.num_layers)]
        self.qkv = [dense(3 * self.hidden) for _ in range(self.num_layers)]
        self.wo = [dense(self.hidden) for _ in range(self.num_layers)]
        self.mlp_up = [dense(4 * self.hidden)
                       for _ in range(self.num_layers)]
        self.mlp_dn = [dense(self.hidden) for _ in range(self.num_layers)]
        self.ln_f = nn.LayerNorm(dtype=dt, param_dtype=jnp.float32)

    # masked-softmax attention shared by both entry points: scores and
    # softmax in f32 (bf16 logits lose ~3 decimal digits; the two paths
    # must agree numerically for the closed-loop consistency contract)
    def _attend(self, q, k, v, mask):
        dh = self.hidden // self.heads
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / dh ** 0.5)
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
        w = jax.nn.softmax(scores, axis=-1).astype(self._dt)
        return jnp.einsum("...hqk,...khd->...qhd", w, v)

    def _split_heads(self, x):
        *lead, _ = x.shape
        return x.reshape(*lead, self.heads, self.hidden // self.heads)

    def __call__(self, u: jax.Array) -> jax.Array:
        b, n, _ = u.shape
        if n > self.max_len:
            raise ValueError(
                f"sequence of {n} bars exceeds attn_max_bars="
                f"{self.max_len}; raise ModelSpec.attn_max_bars (the "
                "learned position table) for longer windows/sweeps")
        h = self.inp(u.astype(self._dt)) + self.pos_emb[:n].astype(self._dt)
        if self.causal:
            mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
        else:
            mask = jnp.ones((1, 1, n, n), bool)
        for l in range(self.num_layers):
            q, k, v = jnp.split(self.qkv[l](self.ln1[l](h)), 3, axis=-1)
            o = self._attend(self._split_heads(q), self._split_heads(k),
                             self._split_heads(v), mask)
            h = h + self.wo[l](o.reshape(b, n, self.hidden))
            h = h + self.mlp_dn[l](nn.gelu(self.mlp_up[l](self.ln2[l](h))))
        return self.ln_f(h)

    def step(self, cache, u: jax.Array, pos: jax.Array, start: jax.Array):
        """One closed-loop bar: u [B,D], pos scalar int32, start [B] int32
        (first position of the current segment). Returns (new_cache,
        out [B,H])."""
        b = u.shape[0]
        n = cache[0][0].shape[1]
        # segment-relative learned position (see class docstring)
        h = self.inp(u.astype(self._dt)) \
            + jnp.take(self.pos_emb, pos - start, axis=0).astype(self._dt)
        idx = jnp.arange(n)
        # [B,1,1,n]: heads and the single query broadcast
        mask = ((idx[None] >= start[:, None])
                & (idx[None] <= pos))[:, None, None, :]
        new_cache = []
        for l in range(self.num_layers):
            q, k, v = jnp.split(self.qkv[l](self.ln1[l](h)), 3, axis=-1)
            kc = jax.lax.dynamic_update_slice(
                cache[l][0], k[:, None, :].astype(self._dt), (0, pos, 0))
            vc = jax.lax.dynamic_update_slice(
                cache[l][1], v[:, None, :].astype(self._dt), (0, pos, 0))
            o = self._attend(self._split_heads(q[:, None, :]),
                             self._split_heads(kc), self._split_heads(vc),
                             mask)
            h = h + self.wo[l](o.reshape(b, 1, self.hidden)[:, 0])
            h = h + self.mlp_dn[l](nn.gelu(self.mlp_up[l](self.ln2[l](h))))
            new_cache.append((kc, vc))
        return tuple(new_cache), self.ln_f(h)


def attn_cache(batch: int, length: int, num_layers: int, hidden: int,
               dtype: Dtype):
    """Zeroed per-layer (K, V) cache for a ``length``-bar AttnStack.step
    sweep — the ONE construction site for the KV-cache pytree (used by
    PianoRollVAE.generate and the attention tests; the scan-lifted decoder
    makes a bound method awkward, hence module-level)."""
    z = jnp.zeros((batch, length, hidden), dtype)
    return tuple((z, z) for _ in range(num_layers))


class ScanGRU(nn.Module):
    """GRU over the bar axis: inputs [B,N,D] (+init h) → hiddens [B,N,H]."""

    hidden: int
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, inputs: jax.Array,
                 init_h: jax.Array | None = None) -> jax.Array:
        dt = _dtype(self.dtype)
        cell = nn.GRUCell(features=self.hidden, dtype=dt,
                          param_dtype=jnp.float32)
        if init_h is None:
            init_h = jnp.zeros((inputs.shape[0], self.hidden), dt)
        scan = nn.scan(
            lambda c, carry, x: c(carry, x),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        _, ys = scan(cell, init_h.astype(dt), inputs.astype(dt))
        return ys
