"""Scan-amortized on-chip microbenchmarks of the train step's pieces.

The axon tunnel costs ~25ms per dispatch (bench/decompose.py) — far above
any single piece of the ~2ms train step — so each candidate op is timed as
K iterations inside ONE jitted ``lax.scan`` dispatch. A scalar carry is
mixed into the input each iteration (x * (1 + 1e-6*c), c fed back from the
output) so XLA cannot hoist the loop-invariant body; the mixing pass itself
costs ~µs and is included in every piece equally.

Pieces (C2 shapes, batch 64 × 4 bars = 256 bar-images unless noted):
  gather_cast   window-id gather from the u8 bar cache + f32 cast
  conv1         first encoder conv (3x3 stride2, 1→16 ch) — MXU-starved
  trunk         full 5-layer ConvTrunk fwd
  head          BarDecoderHead fwd (dense + 5 deconvs + 16→1 head)
  head_bce      head fwd + masked-BCE reduction (XLA fuses these)
  gru4          4-step GRU scan on [64, 384] inputs
  binarize      logit binarize + pitch mask (generation feedback op)
  fwd           full ELBO forward
  step          full train step (fwd+bwd+adam) — the reference total

Prints ms per iteration for each piece; the pieces are not disjoint (trunk
includes conv1; fwd includes everything) but the inclusions bound where the
time goes. Used to target Pallas work (VERDICT r1 item 3) with evidence.
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_scanned(body, k):
    """jit(x, *consts) -> runs body k times with carry-mixed input."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def run(x, *consts):
        def scan_body(c, _):
            xc = jax.tree.map(
                lambda a: (a * (1 + 1e-6 * c)).astype(a.dtype)
                if a.dtype in (jnp.float32, jnp.bfloat16) else a, x)
            y = body(xc, *consts)
            leaf = jax.tree.leaves(y)[0]
            return jnp.sum(leaf).astype(jnp.float32) * 1e-20, None
        c, _ = lax.scan(scan_body, jnp.zeros((), jnp.float32),
                        None, length=k)
        return c

    return jax.jit(run)


def time_piece(fn, args, reps, k):
    out = fn(*args)
    float(out)                                   # compile + axon fence
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out)
        times.append(time.perf_counter() - t0)
    return statistics.median(times) / k


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="c2_gru_4bar")
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--pieces", nargs="*", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from musicvae_tpu.config import get_config
    from musicvae_tpu.midi.tensorize import pitch_mask
    from musicvae_tpu.models import layers
    from musicvae_tpu.ops import losses
    from musicvae_tpu.train import create_state
    from musicvae_tpu.train.trainer import (_make_window_gather,
                                            elbo_from_outputs,
                                            make_train_step_indexed_multi)

    cfg = get_config(args.config)
    spec = cfg.model
    b, nb = cfg.train.batch_size, spec.num_bars
    m = b * nb
    key = jax.random.key(0)
    x_img = (jax.random.uniform(key, (m, 96, 128)) < 0.08).astype(jnp.float32)
    mask = pitch_mask(cfg.midi)

    conv1 = nn.Conv(spec.enc_channels[0], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)
    conv1_vars = conv1.init(key, x_img[..., None])
    trunk = layers.ConvTrunk(spec.enc_channels, spec.dtype)
    trunk_vars = trunk.init(key, x_img[..., None])
    head_in_dim = spec.gru_hidden if spec.kind != "conv_bar" else spec.z_dim
    head = layers.BarDecoderHead(spec.dec_channels, 96, 128, spec.dtype)
    hv = jax.random.normal(key, (m, head_in_dim), jnp.float32)
    head_vars = head.init(key, hv)
    gru = layers.ScanGRU(spec.gru_hidden, spec.dtype)
    gru_in = jax.random.normal(key, (b, nb, spec.bar_feat_dim
                                     + spec.z_dim), jnp.float32)
    gru_vars = gru.init(key, gru_in)
    logits = jax.random.normal(key, (b, nb, 96, 128), jnp.float32) * 3

    model, state = create_state(cfg)
    n_bars_total = 4096
    n_windows = n_bars_total - nb + 1
    data = jax.device_put({
        "bars": (jax.random.uniform(key, (n_bars_total, 96, 128)) < 0.08
                 ).astype(jnp.uint8),
        "starts": jnp.arange(n_windows, dtype=jnp.int32),
    })
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, n_windows, size=(b,)), jnp.int32)
    gather = _make_window_gather(cfg)

    def fwd_loss(batch_x, params):
        lg, lat = model.apply({"params": params}, batch_x,
                              rngs={"latent": jax.random.key(1)})
        return elbo_from_outputs(cfg, lg, batch_x, lat, jnp.asarray(1.0))[0]

    from musicvae_tpu.ops.binarize import binarize_logits

    pieces = {
        # floor: carry-mixing + sum over the same-size input, no op under
        # test — subtract this from every other piece for its net time
        "noop": (lambda xc: xc, (x_img,)),
        "gather_cast": (lambda xc, d: gather(d, idx)["x"], (idx * 0, data)),
        "conv1": (lambda xc, v: conv1.apply(v, xc[..., None]),
                  (x_img, conv1_vars)),
        "conv1_gelu": (lambda xc, v: nn.gelu(conv1.apply(v, xc[..., None])),
                       (x_img, conv1_vars)),
        "conv1_pallas": (lambda xc, v: __import__(
            "musicvae_tpu.ops.conv1_pallas", fromlist=["first_conv_s2"]
            ).first_conv_s2(xc, v["params"]["kernel"][:, :, 0, :],
                            v["params"]["bias"]),
            (x_img, conv1_vars)),
        "trunk": (lambda xc, v: trunk.apply(v, xc[..., None]),
                  (x_img, trunk_vars)),
        "head": (lambda xc, v: head.apply(v, xc), (hv, head_vars)),
        "head_bce": (lambda xc, v: losses.masked_bce_sum(
            head.apply(v, xc), x_img, mask), (hv, head_vars)),
        "gru4": (lambda xc, v: gru.apply(v, xc), (gru_in, gru_vars)),
        "binarize": (lambda xc: binarize_logits(
            xc, cfg.midi.binarize_threshold, mask), (logits,)),
        "fwd": (lambda xc, p: fwd_loss(xc, p),
                (gather(data, idx)["x"], state.params)),
    }
    sel = args.pieces or list(pieces) + ["step"]
    results = {}
    for name in sel:
        if name == "step":
            step_fn = make_train_step_indexed_multi(cfg, model, args.k)
            idxs = jnp.asarray(np.random.default_rng(1).integers(
                0, n_windows, size=(args.k, b)), jnp.int32)
            st, mtr = step_fn(state, data, idxs)
            float(mtr["loss"])
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                st, mtr = step_fn(st, data, idxs)
                float(mtr["loss"])
                times.append(time.perf_counter() - t0)
            results[name] = statistics.median(times) / args.k
        else:
            body, bargs = pieces[name]
            fn = make_scanned(body, args.k)
            results[name] = time_piece(fn, bargs, args.reps, args.k)
        log(f"{name:>12}: {1e3 * results[name]:8.4f} ms/iter")

    print(json.dumps({k2: round(1e6 * v) for k2, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
