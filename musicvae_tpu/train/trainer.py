"""Jitted, donated ELBO train step + host epoch loop (SURVEY §2.1 #10, §3.2).

Reference behavior (BASELINE.json): batch → forward (encoder →
reparameterize → decoder) → masked-BCE + KL-annealed ELBO → backward →
Adam step, with per-step KL-β schedule and periodic checkpoints. In this
rebuild the whole step body — including the β schedule, PRNG splitting and
optimizer update — is ONE donated jitted function; the host loop only feeds
batches and triggers checkpoint/log I/O (SURVEY §3.2 rebuild note).

Data parallelism: the step is jitted over the ('data','model') mesh with the
batch sharded on 'data' and state replicated; XLA inserts the grad psum over
ICI (SURVEY §2.2). The identical code runs on 1 chip (1x1 mesh).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from musicvae_tpu.config import Config
from musicvae_tpu.midi.tensorize import pitch_mask
from musicvae_tpu.models.vae import init_params
from musicvae_tpu.ops import losses
from musicvae_tpu.parallel import mesh as pmesh


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array          # int32 scalar
    rng: jax.Array           # PRNG key, split on-device each step
    # exponential moving average of params (TrainSpec.ema_decay > 0);
    # None when disabled — None is an empty pytree node, so states and
    # checkpoints from EMA-off runs keep their exact old structure
    ema_params: Any = None


def make_lr(cfg: Config):
    """Learning rate per TrainSpec: a float ("constant", the reference's
    fixed Adam lr — keeps the optimizer state pytree identical to rounds
    1–2) or an optax schedule ("cosine": optional linear warmup, then
    cosine decay to lr*lr_min_ratio at num_steps). Schedules are pure
    functions of the optimizer step count, so resume continues exactly."""
    t = cfg.train
    if t.lr_schedule == "constant":
        return t.learning_rate
    if t.lr_schedule == "cosine":
        decay_steps = max(t.num_steps - t.lr_warmup_steps, 1)
        cos = optax.cosine_decay_schedule(
            t.learning_rate, decay_steps, alpha=t.lr_min_ratio)
        if t.lr_warmup_steps <= 0:
            return cos
        warm = optax.linear_schedule(0.0, t.learning_rate,
                                     t.lr_warmup_steps)
        return optax.join_schedules([warm, cos], [t.lr_warmup_steps])
    raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}; "
                     "expected 'constant' or 'cosine'")


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    lr = make_lr(cfg)
    chain = []
    if t.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(t.grad_clip_norm))
    mu_dtype = jnp.dtype(t.adam_mu_dtype)   # TrainSpec.adam_mu_dtype
    if t.weight_decay > 0:
        chain.append(optax.adamw(lr, b1=t.adam_b1, b2=t.adam_b2,
                                 weight_decay=t.weight_decay,
                                 mu_dtype=mu_dtype))
    else:
        chain.append(optax.adam(lr, b1=t.adam_b1, b2=t.adam_b2,
                                mu_dtype=mu_dtype))
    return optax.chain(*chain)


host_init_device = pmesh.host_init_device   # see parallel.mesh docstring


def create_state(cfg: Config, rng: Optional[jax.Array] = None
                 ) -> Tuple[Any, TrainState]:
    import contextlib
    cpu = host_init_device()
    ctx = (jax.default_device(cpu) if cpu is not None
           else contextlib.nullcontext())
    with ctx:
        return _create_state_on_default(cfg, rng, cpu)


def _create_state_on_default(cfg: Config, rng, cpu) -> Tuple[Any, TrainState]:
    if rng is None:
        rng = jax.random.key(cfg.train.seed)
    elif cpu is not None:
        # a committed accelerator-resident key would pull every derived
        # init op back onto the accelerator; uncommit it to the CPU
        rng = jax.device_put(rng, cpu)
    init_rng, loop_rng = jax.random.split(rng)
    model, params = init_params(cfg, init_rng)
    opt = make_optimizer(cfg)
    return model, TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=loop_rng,
        # EMA starts AT the init point (no zero-init debiasing needed);
        # COPIED: aliasing params' buffers would make the donated jitted
        # step donate the same buffer twice
        ema_params=(jax.tree.map(jnp.copy, params)
                    if cfg.train.ema_decay > 0 else None),
    )


def elbo_from_outputs(cfg: Config, logits, x, latents, beta,
                      use_pallas: bool = False, free_bits: float = 0.0,
                      pallas_dual: bool = False):
    """recon + beta * (sum of per-level KLs), batch-mean (ops/losses.py).

    When ``use_pallas`` the masked-BCE reduction runs through the fused
    Pallas TPU kernel (ops/fused_elbo.py); numerics match the jnp path to
    the tolerance asserted in tests/test_fused_elbo.py. ``pallas_dual``
    selects the dual-output forward (grad tile emitted alongside the sum
    — for DIFFERENTIATED graphs, i.e. the train step; grad-free eval
    keeps the single-output kernel, which skips the grad-tile HBM write).

    ``free_bits`` > 0 floors each latent dimension's batch-mean KL in the
    MINIMIZED objective (ops/losses.kl_free_bits, per level); the reported
    ``kl`` metric stays the true un-floored KL so curves remain comparable
    across runs with and without the floor. The train step passes
    cfg.train.free_bits; eval (utils/metrics.py) always scores the true
    ELBO.
    """
    mask = pitch_mask(cfg.midi)
    batch = logits.shape[0]
    if use_pallas:
        from musicvae_tpu.ops.fused_elbo import (masked_bce_sum_pallas,
                                                 masked_bce_sum_pallas_dual)
        kernel = (masked_bce_sum_pallas_dual if pallas_dual
                  else masked_bce_sum_pallas)
        # f32 x up front: custom_vjp primals must be inexact for the bwd
        # rule (uint8 resident-gather rolls would otherwise need float0
        # cotangent plumbing); the kernel materializes padded inputs
        # anyway, so this costs nothing extra
        recon = kernel(logits, x.astype(jnp.float32), mask) / batch
    else:
        recon = losses.masked_bce_sum(logits, x, mask) / batch
    kl = sum(losses.kl_diag_gaussian(mu, lv) for mu, lv in latents) / batch
    if free_bits > 0.0:
        kl_obj = sum(losses.kl_free_bits(mu, lv, free_bits)
                     for mu, lv in latents) / batch
    else:
        kl_obj = kl
    loss = recon + beta * kl_obj
    return loss, {"loss": loss, "recon": recon, "kl": kl, "beta": beta}


def make_train_step(cfg: Config, model, opt=None,
                    use_pallas: Optional[bool] = None) -> Callable:
    """Build the donated, jitted train step: (state, batch) → (state, metrics).

    batch: {"x": [B,N,T,P] f32, optional "chord": [B,N] i32, "key_sig": [B] i32}
    """
    opt = opt or make_optimizer(cfg)
    return jax.jit(_train_step_body(cfg, model, opt, use_pallas),
                   donate_argnums=(0,))


def make_train_step_multi(cfg: Config, model, k: int, opt=None,
                          use_pallas: Optional[bool] = None,
                          packed_x: bool = False) -> Callable:
    """K train steps in ONE device program via lax.scan over micro-batches.

    (state, stacked_batch) → (state, metrics of the last micro-step), where
    every leaf of ``stacked_batch`` has a leading [K] axis. Amortizes the
    host→device dispatch (the single-step path pays one dispatch per step,
    which dominates at this model scale); the scan body is exactly the
    single-step update, so K scanned steps == K sequential steps.

    ``packed_x``: the batch carries bit-packed rolls under "x_packed"
    (uint8, pitch axis /8 — ops/pack.py) and each micro-step unpacks its
    own slice on device. 32x fewer host-link bytes than float32 rolls;
    the streaming path's transfer-bound fix.
    """
    opt = opt or make_optimizer(cfg)
    single = _train_step_body(cfg, model, opt, use_pallas)

    def multi_step(state: TrainState, stacked_batch):
        def body(carry, batch):
            if packed_x:
                from musicvae_tpu.ops.pack import unpack_bits
                batch = dict(batch)
                batch["x"] = unpack_bits(batch.pop("x_packed"))
            new_state, metrics = single(carry, batch)
            return new_state, metrics
        state, metrics = jax.lax.scan(body, state, stacked_batch)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return jax.jit(multi_step, donate_argnums=(0,))


def _train_step_body(cfg: Config, model, opt,
                     use_pallas: Optional[bool] = None) -> Callable:
    """The un-jitted single-step update shared by make_train_step and
    make_train_step_multi."""
    if use_pallas is None:
        use_pallas = (cfg.train.use_pallas_loss
                      and jax.default_backend() == "tpu")
    t = cfg.train
    if t.transpose_aug and cfg.model.kind == "cond" and (
            cfg.model.cond_chord_classes != 24
            or cfg.model.cond_key_classes != 24):
        raise ValueError(
            "transpose_aug on a cond model rotates chord/key labels with "
            "the pitch shift, which requires the 24-class root*2+minor "
            "encoding (midi/labels.py); got "
            f"{cfg.model.cond_chord_classes}/{cfg.model.cond_key_classes} "
            "classes — an unknown encoding cannot be rotated safely")
    if t.transpose_aug < 0:
        raise ValueError(f"transpose_aug must be >= 0, got "
                         f"{t.transpose_aug}")

    def loss_fn(params, batch, latent_rng, beta):
        kw = {}
        if cfg.model.kind == "cond":
            kw = {"chord": batch["chord"], "key_sig": batch["key_sig"]}
        logits, latents = model.apply({"params": params}, batch["x"], **kw,
                                      rngs={"latent": latent_rng})
        # the train graph is differentiated: the dual-output kernel emits
        # the BCE grad tile in the forward pass so the VJP is one fused
        # scale instead of a second logits pass (ops/fused_elbo.py)
        return elbo_from_outputs(cfg, logits, batch["x"], latents, beta,
                                 use_pallas, free_bits=t.free_bits,
                                 pallas_dual=True)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        beta = losses.beta_schedule(state.step, t.beta_max,
                                    t.beta_warmup_steps, t.beta_hold_steps,
                                    t.beta_schedule, t.beta_cycle_steps)
        step_rng, next_rng = jax.random.split(state.rng)
        if t.transpose_aug:
            # per-example pitch shift, on device, keyed off the same
            # checkpointed PRNG chain as the latent noise → exact resume
            # determinism holds with augmentation on (ops/augment.py)
            from musicvae_tpu.ops.augment import (random_shifts,
                                                  rotate_chord_classes,
                                                  transpose_rolls)
            aug_rng, step_rng = jax.random.split(step_rng)
            batch = dict(batch)
            shifts = random_shifts(aug_rng, batch["x"].shape[0],
                                   t.transpose_aug)
            batch["x"] = transpose_rolls(batch["x"], shifts)
            if cfg.model.kind == "cond":
                # labels transpose with the content (root*2+minor
                # encoding rotates exactly; guarded at build time)
                batch["chord"] = rotate_chord_classes(
                    batch["chord"], shifts[:, None])
                batch["key_sig"] = rotate_chord_classes(
                    batch["key_sig"], shifts)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng, beta)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        # in-band failure detection (SURVEY §5.3): surfaced in logs so a
        # diverged run is caught at the next log boundary; full NaN
        # debugging via utils.debug.debug_mode(nans=True).
        metrics["nonfinite"] = 1.0 - jnp.isfinite(metrics["loss"]).astype(
            jnp.float32)
        new_ema = state.ema_params
        if t.ema_decay > 0:
            # plain EMA from the init point; a pure function of the param
            # trajectory, carried in TrainState so resume is bit-exact
            new_ema = jax.tree.map(
                lambda ema, p: ema * t.ema_decay + p * (1.0 - t.ema_decay),
                state.ema_params, new_params)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  step=state.step + 1, rng=next_rng,
                                  ema_params=new_ema)
        return new_state, metrics

    return train_step


def make_train_step_indexed(cfg: Config, model, opt=None,
                            use_pallas: Optional[bool] = None) -> Callable:
    """Train step over a DEVICE-RESIDENT dataset: (state, data, idx) →
    (state, metrics), where ``data`` holds the corpus's bars (uint8,
    [T,96,128]), window ``starts`` and labels in HBM, and ``idx`` is a
    [batch] int32 window-id vector (the only per-step host transfer — a
    few hundred bytes).

    Rationale: the reference-style loop (host batch → device each step)
    moves the whole batch across the host link every step; a bar-level
    uint8 cache is small (≪ HBM), so the TPU-first layout is one upload at
    startup, then per step: gather window starts → gather the
    [B, num_bars] bar block → cast to f32 — all on device. Measured on the
    axon tunnel this is the difference between ~7 and ~300 steps/s, and
    windows are never materialized (4× memory saving vs a window cache).
    """
    opt = opt or make_optimizer(cfg)
    single = _train_step_body(cfg, model, opt, use_pallas)
    gather = _make_window_gather(cfg)

    def step(state: TrainState, data, idx):
        return single(state, gather(data, idx))

    return jax.jit(step, donate_argnums=(0,))


def _make_window_gather(cfg: Config) -> Callable:
    """(device data, [B] window ids) → batch dict, all on device."""
    nb = cfg.model.num_bars

    def gather(data, idx):
        starts = jnp.take(data["starts"], idx)
        bar_idx = starts[:, None] + jnp.arange(nb, dtype=starts.dtype)
        # x stays uint8 out of the gather: the model's first conv casts
        # straight to its compute dtype and the loss upcasts inside its
        # elementwise fusion (ops/losses.bce_with_logits), so the 4x-
        # larger f32 copy of the batch is never materialized in HBM
        batch = {"x": jnp.take(data["bars"], bar_idx, axis=0)}
        if "chords" in data:
            batch["chord"] = jnp.repeat(
                jnp.take(data["chords"], idx)[:, None], nb, axis=1)
            batch["key_sig"] = jnp.take(data["keys"], idx)
        return batch

    return gather


def make_train_step_indexed_multi(cfg: Config, model, k: int, opt=None,
                                  use_pallas: Optional[bool] = None,
                                  gather: Optional[Callable] = None
                                  ) -> Callable:
    """K device-resident indexed steps per dispatch: (state, data,
    idxs[K,B]) → (state, last-step metrics). One host→device round trip
    per K steps — the production training mode (host-link latency and
    jitter amortize away; the scan body is exactly the single-step update,
    equivalence tested in tests/test_train_e2e.py).

    ``gather`` overrides the (data, idx) → batch gather — used by the
    sharded-corpus layout's shard_map local gather
    (train/sharded_corpus.make_sharded_gather); default is the replicated
    window gather."""
    opt = opt or make_optimizer(cfg)
    single = _train_step_body(cfg, model, opt, use_pallas)
    gather = gather or _make_window_gather(cfg)

    def multi(state: TrainState, data, idxs):
        def body(carry, idx):
            return single(carry, gather(data, idx))
        state2, metrics = jax.lax.scan(body, state, idxs)
        return state2, jax.tree.map(lambda m: m[-1], metrics)

    return jax.jit(multi, donate_argnums=(0,))


def pick_k(cfg: Config, do_eval: bool) -> int:
    """Steps per device dispatch: the largest divisor of the log/ckpt/eval
    cadence gcd, capped at 100.

    Cap rationale: a single dispatch over the axon tunnel costs ~25ms
    round-trip (bench/decompose.py 'dispatch(empty)'), so K=100 puts the
    per-step dispatch share at ~0.25ms — below 12% of even the smallest
    config's device step time. k divides every cadence, so once the step
    counter is k-aligned (see dispatch_sizes) every absolute boundary
    (step % log_every == 0 etc.) lands exactly on a dispatch edge.

    Cadences <= 0 mean "off" (matching eval_every's contract) and don't
    constrain k; with every cadence off there is no boundary to hit and
    k is simply the cap.
    """
    cadences = [c for c in (cfg.train.log_every, cfg.train.ckpt_every) +
                ((cfg.train.eval_every,) if do_eval else ()) if c > 0]
    if not cadences:
        return 100
    g = math.gcd(*cadences) if len(cadences) > 1 else cadences[0]
    return max(d for d in range(1, min(g, 100) + 1) if g % d == 0)


def dispatch_sizes(start: int, total: int, k: int) -> list:
    """Per-dispatch step counts covering [start, total).

    At most three distinct sizes appear — an alignment dispatch bringing
    the step counter to the next multiple of k, the steady-state k, and a
    final partial dispatch — so a resume from an ARBITRARY step (e.g.
    after a corrupt-latest checkpoint fallback) costs at most two extra
    XLA compiles and keeps the production K for the whole remaining run
    (round 2 forced k=1 forever when k ∤ start_step). Every multiple of k
    inside the range is visited, so absolute log/ckpt/eval boundaries
    (which k divides, pick_k) are never skipped.
    """
    sizes = []
    s = start
    while s < total:
        ki = min(k - s % k, total - s)
        sizes.append(ki)
        s += ki
    return sizes


def make_id_schedule(seed: int, n: int, b: int) -> Callable[[int], np.ndarray]:
    """Stateless per-step window-id schedule: step -> [b] int32 ids.

    A pure function of (seed, step), so resume is O(1): a run restarted at
    step S draws exactly the ids a continuous run would at S — no
    O(start_step) fast-forward replay (round 2 replayed every historical
    draw on resume; equivalence is re-tested in test_eval_training.py).
    Semantics match the reference-style shuffled epochs: epoch e uses the
    permutation seeded by (seed, 0, e), consumed b ids per step with the
    (< b) remainder dropped; corpora smaller than one batch sample with
    replacement per step (seeded (seed, 1, step)).
    """
    bpe = n // b          # batches (= steps) per epoch; 0 when n < b
    cache: Dict[str, Any] = {}

    def ids_for_step(step: int) -> np.ndarray:
        if bpe == 0:
            return np.random.default_rng((seed, 1, step)).integers(
                0, n, size=b).astype(np.int32)
        epoch, pos = divmod(step, bpe)
        if cache.get("epoch") != epoch:
            cache["epoch"] = epoch
            cache["perm"] = np.random.default_rng(
                (seed, 0, epoch)).permutation(n).astype(np.int32)
        return cache["perm"][pos * b:(pos + 1) * b]

    return ids_for_step


def _write_json_atomic(path: str, obj) -> None:
    """Crash-safe JSON write: tmp + fsync + os.replace, so a reader never
    sees a truncated file (the best-metric sidecar guards exactly the
    crash-mid-write window — a torn write would silently reset the best
    tracking it exists to preserve)."""
    import json as _json
    import os as _os
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(obj, f)
        f.flush()
        _os.fsync(f.fileno())
    _os.replace(tmp, path)


def train(cfg: Config,
          data: Any,
          num_steps: Optional[int] = None,
          mesh=None,
          ckpt_manager=None,
          log_fn: Optional[Callable[[int, Dict], None]] = None,
          state: Optional[TrainState] = None,
          eval_data: Any = None,
          best_ckpt_manager=None,
          stop=None):
    """Host-side loop. ``data`` is either a PianoRollDataset (preferred:
    uploaded to HBM once, batches gathered on-device by index — see
    make_train_step_indexed) or an iterator of host batches (streaming
    fallback for corpora that don't fit in HBM). A streaming iterator
    wrapped in data.HostLocalBatches yields PER-PROCESS batch slices
    (batch_size/process_count rows each, typically from
    PianoRollDataset.host_shard) — per-host sharded data loading: no
    host ever materializes the global batch or the full corpus.

    ``num_steps`` is the TOTAL step count: a resumed state continues from
    its restored step and stops at num_steps.

    With ``eval_data`` (a held-out PianoRollDataset, see
    PianoRollDataset.split) and cfg.train.eval_every > 0, a deterministic
    eval sweep runs every eval_every steps; metrics are logged under
    ``eval_*`` keys and, when ``best_ckpt_manager`` is given, the state
    with the lowest eval loss so far is checkpointed there (SURVEY §2.1
    #10 "periodic eval recon" — the early posterior-collapse signal).

    ``stop`` (a preemption.GracefulStop, or anything with a ``requested``
    attribute) makes the loop preemption-safe: checked once per dispatch
    (collectively on a multi-process mesh — stop iff ANY process was
    signaled), and when set the loop checkpoints the exact interrupted
    step into ``ckpt_manager`` and returns normally. Resume from that
    step is O(1) and keeps the production K (dispatch_sizes).

    Returns (model, final_state, last_metrics).
    """
    mesh = mesh or pmesh.make_mesh(cfg.mesh)
    if state is None:
        model, state = create_state(cfg)
    else:
        from musicvae_tpu.models.vae import build_model
        model = build_model(cfg)   # resumed: don't re-init throwaway params
    # replicate the state across the mesh — put_tree spans processes (every
    # process computed the identical state: init is deterministic in seed,
    # restore loads the same checkpoint)
    state = pmesh.put_tree(state, pmesh.replicated(mesh))
    num_steps = num_steps if num_steps is not None else cfg.train.num_steps
    b = cfg.train.batch_size
    # host mirror of state.step (one sync at startup, none per step). On
    # resume this starts at the restored step so (a) log/ckpt cadences carry
    # the true step number and (b) num_steps means TOTAL steps — resuming a
    # finished run is a no-op rather than a silent re-train.
    start_step = int(jax.device_get(state.step))

    eval_every = cfg.train.eval_every
    do_eval = (eval_every > 0 and eval_data is not None
               and len(eval_data) > 0)
    if do_eval:
        from musicvae_tpu.utils.metrics import make_eval_fn
        eval_fn = make_eval_fn(cfg, model)
        eb = min(b, len(eval_data))
        # fixed partition: the same eval windows every sweep, so curves are
        # comparable across steps (and across runs with one seed)
        eval_perm = np.random.default_rng(cfg.train.seed).permutation(
            len(eval_data)).astype(np.int32)
        n_eval_batches = min(cfg.train.eval_batches,
                             max(1, len(eval_data) // eb))
        # resume-safe best tracking: the best eval loss so far persists in
        # a sidecar next to the best checkpoint, so a resumed run cannot
        # overwrite a better earlier state with its own first (worse) eval.
        # (Orbax's CheckpointManagerOptions(best_fn=..., best_mode='min')
        # + save(metrics=...) is the native alternative; the sidecar keeps
        # the best-manager construction identical to the step manager's
        # and the compare logic explicit/testable.)
        best_eval_loss = float("inf")
        best_metric_path = None
        if best_ckpt_manager is not None:
            import json as _json
            import os as _os
            best_metric_path = _os.path.join(
                str(best_ckpt_manager.directory), "best_metric.json")
            if _os.path.exists(best_metric_path):
                try:
                    with open(best_metric_path) as f:
                        best_eval_loss = float(
                            _json.load(f)["eval_loss"])
                except (OSError, ValueError, KeyError):
                    pass   # unreadable sidecar: fall back to fresh best
            if jax.process_count() > 1:
                # only process 0 owns the sidecar (it may not exist on
                # other hosts' filesystems); every process must agree on
                # the best so the collective best-checkpoint save below
                # is entered by all of them or none
                from jax.experimental import multihost_utils
                best_eval_loss = float(multihost_utils.broadcast_one_to_all(
                    np.float64(best_eval_loss)))

        def run_eval(cur_state) -> Dict[str, float]:
            # with EMA on, the smoothed weights are scored on the SAME
            # placed batch (eval_ema_* keys) — one host→device transfer
            # per batch regardless of how many param sets are scored;
            # best-checkpoint selection stays keyed on the raw eval_loss
            # so the tracked best matches what resume continues from
            param_sets = [("eval_", cur_state.params)]
            if cur_state.ema_params is not None:
                param_sets.append(("eval_ema_", cur_state.ema_params))
            acc: Dict[str, list] = {}
            for i in range(n_eval_batches):
                # uint8 rolls: 4x fewer host-link bytes per eval sweep
                # (the model casts on device; loss/PRF upcast in-fusion —
                # same numerics, values are exactly {0,1})
                ebatch = pmesh.put_tree(
                    eval_data.batch(eval_perm[i * eb:(i + 1) * eb],
                                    x_dtype=np.uint8),
                    pmesh.replicated(mesh))
                for prefix, params in param_sets:
                    em = jax.device_get(
                        eval_fn(params, ebatch, jax.random.key(i)))
                    for mk, mv in em.items():
                        acc.setdefault(prefix + mk, []).append(float(mv))
            return {mk: sum(mv) / len(mv) for mk, mv in acc.items()}

    # K steps per dispatch (host-link jitter amortizes, pick_k) executed
    # per the alignment-aware plan (dispatch_sizes): the same K whether
    # the run starts at 0 or resumes from an arbitrary step.
    k = pick_k(cfg, do_eval)
    sizes = dispatch_sizes(start_step, num_steps, k)

    resident = hasattr(data, "bars")
    if resident:
        sharded_corpus = cfg.train.corpus_layout == "sharded"
        from jax.sharding import NamedSharding, PartitionSpec
        if sharded_corpus:
            # piece-wise corpus shards over the 'data' axis: each device
            # holds 1/D of the bar cache and gathers batch rows from its
            # LOCAL shard via shard_map — resident training for corpora
            # up to D× one device's HBM (train/sharded_corpus.py)
            from musicvae_tpu.train.sharded_corpus import (
                build_sharded_arrays, make_sharded_gather,
                make_sharded_id_schedule, sharded_data_shardings)
            n_shards = mesh.shape[pmesh.DATA_AXIS]
            arrays, counts = build_sharded_arrays(data, n_shards,
                                                  cfg.train.seed)
            shardings = sharded_data_shardings(mesh)
            if jax.process_count() == 1:
                data_dev = {kk: jax.device_put(v, shardings[kk])
                            for kk, v in arrays.items()}
            else:
                data_dev = {kk: pmesh.put_global(v, shardings[kk])
                            for kk, v in arrays.items()}
            multi_fn = make_train_step_indexed_multi(
                cfg, model, k, gather=make_sharded_gather(cfg, mesh))
            ids_for_step = make_sharded_id_schedule(cfg.train.seed,
                                                    counts, b)
        else:
            arrays = {"bars": data.bars, "starts": data.starts}
            if cfg.model.kind == "cond":
                arrays["chords"] = data.chords
                arrays["keys"] = data.keys
            # one upload at startup; on a process-spanning mesh each host
            # holds the same cache and uploads only its own devices'
            # (replicated) shards — the multi-host data path (SURVEY §2.2
            # comm backend row)
            data_dev = pmesh.put_tree(arrays, pmesh.replicated(mesh))
            multi_fn = make_train_step_indexed_multi(cfg, model, k)
            # stateless schedule: resume from any step is O(1) and draws
            # the ids a continuous run would (make_id_schedule docstring)
            ids_for_step = make_id_schedule(cfg.train.seed, len(data), b)
        # DP: shard the window-id batch axis over 'data'; the gather then
        # yields a batch sharded on 'data' and XLA psums the grads.
        idx_sharding = NamedSharding(mesh, PartitionSpec(None,
                                                         pmesh.DATA_AXIS))
        if jax.process_count() > 1:
            # fail fast on silently divergent host data: put_global's
            # contract (parallel/mesh.py) is that every process holds the
            # IDENTICAL corpus — a nondeterministic data source would
            # otherwise train on divergent shards with no error
            from musicvae_tpu.parallel.distributed import \
                assert_hosts_identical
            # contiguous ndarrays feed hashlib via the buffer protocol —
            # no .tobytes() copy of a corpus that can be HBM-sized; and
            # the hash covers the LABELS too (a cond model trained on
            # divergent chord/key sidecars is the same silent-divergence
            # failure as divergent bars)
            assert_hosts_identical(
                "resident corpus",
                np.ascontiguousarray(data.bars),
                np.ascontiguousarray(data.starts),
                np.ascontiguousarray(data.chords),
                np.ascontiguousarray(data.keys),
                np.int64(cfg.train.seed).tobytes())
    else:
        # STREAMING path (corpora larger than HBM): K-step scan over
        # stacked host batches, double-buffered — a producer thread packs
        # and device_puts the NEXT K batches while the chip runs the
        # current K steps. The host link is the bound here, so rolls cross
        # it bit-packed (ops/pack.py, 32x fewer bytes than f32; serve the
        # iterator with x_dtype=np.uint8 to also skip the host-side float
        # expansion). Measured on the axon tunnel @ C2: 5.8 steps/s
        # (round-1 serialized f32) → 103 steps/s (packed u8 + prefetch);
        # the residual gap to the resident path (~428) is tunnel transfer
        # jitter — on a local PCIe host the packed stream (~0.4 MB/step)
        # is far below link capacity.
        import queue
        import threading

        # set when the consumer loop exits early (preemption stop or an
        # exception): the producer would otherwise block forever on a
        # full queue — a leaked thread pinning up to two K-step
        # device-resident batch stacks in a long-lived process
        producer_quit = threading.Event()

        multi_fn = make_train_step_multi(cfg, model, k, packed_x=True)
        from jax.sharding import NamedSharding, PartitionSpec
        from musicvae_tpu.data.dataset import HostLocalBatches
        from musicvae_tpu.ops.pack import pack_bits_np
        stacked_sharding = NamedSharding(
            mesh, PartitionSpec(None, pmesh.DATA_AXIS))
        batch_q: "queue.Queue" = queue.Queue(maxsize=2)
        multihost = jax.process_count() > 1
        # per-host sharded loading: the iterator yields only this
        # process's rows of the global batch (data.HostLocalBatches);
        # placement assembles the global array from the local pieces
        host_local = isinstance(data, HostLocalBatches)
        put_stack = pmesh.put_host_local if host_local else pmesh.put_tree

        class _Quit(Exception):
            pass

        def _qput(item):
            # bounded-wait put: wakes to notice producer_quit instead of
            # blocking forever on a queue the consumer stopped draining
            while not producer_quit.is_set():
                try:
                    batch_q.put(item, timeout=0.2)
                    return
                except queue.Full:
                    continue
            raise _Quit

        def _producer():
            # any failure (incl. an exhausted finite iterator) must reach
            # the training loop — a dead daemon thread would otherwise
            # leave batch_q.get() blocked forever
            try:
                for di, ki in enumerate(sizes):
                    host = [next(data) for _ in range(ki)]
                    stacked = jax.tree.map(lambda *xs: np.stack(xs), *host)
                    # rolls are binary: ship 1 bit/cell, unpack on device.
                    # Non-binary values would be silently collapsed by the
                    # pack — reject them loudly (the round-1 iterator path
                    # shipped x unchanged).
                    xv = stacked.pop("x")
                    if not (((xv == 0) | (xv == 1)).all()):
                        raise ValueError(
                            "streaming batches must carry binary rolls "
                            "(x ∈ {0,1}); got non-binary values, which "
                            "bit-packing would corrupt")
                    stacked["x_packed"] = pack_bits_np(xv)
                    if di == 0:
                        if host_local:
                            bl = xv.shape[1] * jax.process_count()
                            if bl != b:
                                raise ValueError(
                                    "host-local streaming batches must "
                                    f"carry batch_size/process_count = "
                                    f"{b}/{jax.process_count()} rows "
                                    f"each; got {xv.shape[1]}")
                        if multihost:
                            # first-stack cross-host guard. Default
                            # (replicated) contract: every host's iterator
                            # yields IDENTICAL batches — hash the content.
                            # Host-local contract: contents intentionally
                            # differ, but the STRUCTURE (shapes/dtypes/
                            # keys) must agree or assembly would fail
                            # confusingly inside XLA. The main thread runs
                            # the collective (see loop below).
                            chunks = ([repr(sorted(
                                (kk, vv.shape, str(vv.dtype))
                                for kk, vv in stacked.items())).encode()]
                                if host_local else
                                [np.ascontiguousarray(leaf).tobytes()
                                 for leaf in jax.tree.leaves(stacked)])
                            _qput(("check_hosts",
                                   "streaming first-batch structure"
                                   if host_local else
                                   "streaming first batch", chunks))
                    _qput(put_stack(stacked, stacked_sharding))
            except _Quit:
                return
            except StopIteration:
                exc: BaseException = RuntimeError(
                    f"streaming data iterator exhausted before "
                    f"{num_steps} steps; supply an infinite iterator "
                    f"or fewer num_steps")
                try:
                    _qput(exc)
                except _Quit:
                    return
            except BaseException as e:          # noqa: BLE001
                try:
                    _qput(e)
                except _Quit:
                    return

        threading.Thread(target=_producer, daemon=True,
                         name="mvae-prefetch").start()

    metrics = {}
    step = start_step
    try:
        for ki in sizes:
            if resident:
                # every process draws the same ids (same seed) and put_tree
                # uploads each device's slice — the batch axis is globally
                # sharded over 'data' whether or not the mesh spans hosts
                idxs = np.stack([ids_for_step(step + j) for j in range(ki)])
                idxs = pmesh.put_tree(idxs, idx_sharding)
                state, metrics = multi_fn(state, data_dev, idxs)
                step += ki
            else:
                item = batch_q.get()
                if isinstance(item, BaseException):
                    raise item
                if isinstance(item, tuple) and item[0] == "check_hosts":
                    from musicvae_tpu.parallel.distributed import \
                        assert_hosts_identical
                    assert_hosts_identical(item[1], *item[2])
                    item = batch_q.get()
                    if isinstance(item, BaseException):
                        raise item
                state, metrics = multi_fn(state, item)
                step += ki
            if (log_fn is not None and cfg.train.log_every > 0
                    and step % cfg.train.log_every == 0):
                log_fn(step, jax.device_get(metrics))
            if do_eval and step % eval_every == 0:
                eval_metrics = run_eval(state)
                if log_fn is not None:
                    log_fn(step, eval_metrics)
                if (best_ckpt_manager is not None
                        and eval_metrics["eval_loss"] < best_eval_loss):
                    best_eval_loss = eval_metrics["eval_loss"]
                    from musicvae_tpu.checkpoints import io as ckpt_io
                    ckpt_io.save(best_ckpt_manager, state, cfg)
                    # crash-safe + single-writer: only process 0 (the same
                    # process that owns the Orbax commit) writes, atomically
                    if best_metric_path is not None and jax.process_index() == 0:
                        _write_json_atomic(best_metric_path,
                                           {"eval_loss": best_eval_loss,
                                            "step": step})
            if (ckpt_manager is not None and cfg.train.ckpt_every > 0
                    and step % cfg.train.ckpt_every == 0):
                from musicvae_tpu.checkpoints import io as ckpt_io
                ckpt_io.save(ckpt_manager, state, cfg)
            if stop is not None:
                stop_now = bool(stop.requested)
                if jax.process_count() > 1:
                    # collective decision: the save below is a collective op,
                    # so every process must agree to enter it this dispatch
                    # even when the scheduler signaled only some of them
                    from jax.experimental import multihost_utils
                    stop_now = bool(multihost_utils.process_allgather(
                        np.int32(stop_now)).max())
                if stop_now:
                    if ckpt_manager is not None and (
                            cfg.train.ckpt_every <= 0
                            or step % cfg.train.ckpt_every != 0):
                        from musicvae_tpu.checkpoints import io as ckpt_io
                        ckpt_io.save(ckpt_manager, state, cfg)
                    break
    finally:
        if not resident:
            # release a producer blocked on a full queue (early
            # exit via preemption stop or any exception) — see
            # producer_quit above
            producer_quit.set()
    return model, state, metrics
