"""CLI entry points (SURVEY §1 L6): preprocess / train / eval / generate /
serve.

Reference: `python train.py`, `python generate.py` scripts with a config
module. Rebuild: `python -m musicvae_tpu <cmd> --config c2_gru_4bar`
(SURVEY §5.6), configs are the frozen C1–C5 dataclasses. ``serve`` is the
production-serving surface the reference lacks: load + compile ONCE, then
answer generation requests over line-delimited JSON with no per-request
recompiles or reloads.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import List, Optional

import numpy as np

# single source for the three --ema CLI guards (generate/eval-gen, convert,
# serve) so the wording cannot drift
_EMA_ERROR = ("error: --ema needs a checkpoint trained with "
              "--ema-decay > 0 (this one has no EMA weights)")


def _use_ema_weights(state):
    """The state with params replaced by its EMA weights, or None after
    printing _EMA_ERROR (callers map None to rc 2). The single home of
    the guard+swap used by eval / generate / eval-gen / convert /
    serve."""
    if state.ema_params is None:
        print(_EMA_ERROR, file=sys.stderr)
        return None
    return state.replace(params=state.ema_params)


def _check_cache_grid(ds, cfg, path: str):
    """None if the cache's quantization grid matches cfg.midi, else the
    error string. Shared by train/eval/eval-gen --data: a cache built
    under another meter (preprocess --meter) must never silently feed a
    model whose MidiSpec claims a different grid. Legacy caches carry no
    grid metadata; they were all built on the 24/4 default. Only the
    GRID (resolution + bar length) gates reuse — the declared meter
    affects exports, not quantization, so a 6/8 cache serves a 3/4
    config (identical 32×3 grid) and vice versa."""
    g = ds.grid or (24, 4)
    cache_grid = (g[0], g[1], g[2] if len(g) > 2 else 0)
    cache_spb = cache_grid[2] or cache_grid[0] * cache_grid[1]
    cfg_grid = (cfg.midi.steps_per_quarter, cfg.midi.quarters_per_bar,
                cfg.midi.steps_per_bar)
    if (cache_grid[0], cache_spb) != (cfg_grid[0], cfg_grid[2]):
        return (f"{path} was quantized on grid {cache_grid[0]} "
                f"steps/quarter x {cache_spb} steps/bar but the "
                f"config expects {cfg_grid[0]}x{cfg_grid[2]}; pass the "
                f"matching --meter (or re-run preprocess)")
    return None


class _UsageError(ValueError):
    """A flag/usage error raised past argparse (e.g. --meter values that
    need config context to validate). main() prints it as a clean
    one-liner; every OTHER ValueError still tracebacks, so internal bugs
    stay distinguishable from bad user input."""


def _positive_int(s: str) -> int:
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError(f"must be >= 1, got {v}")
    return v


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default="c1_conv_bar",
                   help="one of the canonical configs (config.py)")
    p.add_argument("--ckpt-dir", default="checkpoints_out")
    # MIDI-ingestion knobs, honored by every command that reads .mid files
    # (preprocess/train/eval/eval-gen/generate/reconstruct/serve) and
    # applied AFTER checkpoint-config restore (_apply_midi_overrides)
    p.add_argument("--max-events", type=_positive_int, default=None,
                   help="max notes per MIDI file (MidiSpec.max_events, "
                        "default 4096); dense classical piano pieces can "
                        "exceed the default — raise it here")
    p.add_argument("--ignore-time-signature", action="store_true",
                   help="tensorize files whose declared time signature "
                        "does not match the config's bar length anyway "
                        "(bar boundaries will follow the config, not the "
                        "file; default is a hard error)")
    p.add_argument("--meter", default=None, metavar="N/D",
                   help="train/ingest in this meter with EXACT bar "
                        "boundaries (config.meter_grid). Meters fitting "
                        "the 96-step bar adapt the grid RESOLUTION "
                        "(3/4 -> three 32-step quarters; also 6/8, 2/4, "
                        "2/2, 12/8, ...); other meters adapt the BAR "
                        "LENGTH at 24 steps/quarter (5/4 -> 120-step "
                        "bars, 7/8 -> 84). Exports declare the ORIGINAL "
                        "meter back (6/8 stays 6/8)")


def _apply_midi_overrides(cfg, args):
    """--max-events / --ignore-time-signature onto cfg.midi. These are
    ingestion knobs, not model semantics, so they may be applied to
    checkpoint-restored configs too (the roll SHAPE is untouched)."""
    import dataclasses
    kw = {}
    if getattr(args, "max_events", None) is not None:
        kw["max_events"] = args.max_events
    if getattr(args, "ignore_time_signature", False):
        kw["ignore_time_signature"] = True
    if getattr(args, "meter", None):
        from musicvae_tpu.config import meter_grid
        try:
            num, den = (int(v) for v in args.meter.split("/"))
        except ValueError:
            raise _UsageError(f"--meter expects N/D (e.g. 3/4), "
                              f"got {args.meter!r}") from None
        try:
            kw.update(meter_grid(num, den, cfg.midi.steps_per_bar))
        except ValueError as e:
            raise _UsageError(str(e)) from None
    if kw:
        cfg = cfg.replace(midi=dataclasses.replace(cfg.midi, **kw))
    return cfg


def _read_midi_corpus(midi_glob: str, labels_path=None):
    """Read a MIDI glob into (pieces, error_rc). Real MIDI carries no
    chord/key classes: a sidecar label (JSON {basename: {chord, key}})
    wins, otherwise entries are None and the caller decides whether to
    infer (midi/labels.py). Shared by preprocess and train --midi-glob —
    one reading/validation path, one drift surface."""
    sidecar = {}
    if labels_path:
        import json
        with open(labels_path) as f:
            sidecar = json.load(f)
    pieces = []
    for path in sorted(glob.glob(midi_glob)):
        with open(path, "rb") as f:
            data = f.read()
        lab = sidecar.get(os.path.basename(path), {})
        chord = lab.get("chord")
        key = lab.get("key")
        for name, v in (("chord", chord), ("key", key)):
            if v is not None and not 0 <= int(v) < 24:
                print(f"error: label {name}={v} for {path} out of "
                      f"range 0..23", file=sys.stderr)
                return None, 2
        pieces.append((data, chord, key))
    if not pieces:
        print(f"no MIDI files match {midi_glob}", file=sys.stderr)
        return None, 1
    return pieces, 0


def cmd_preprocess(args) -> int:
    from musicvae_tpu.config import get_config
    from musicvae_tpu.data import PianoRollDataset, synth_corpus

    cfg = _apply_midi_overrides(get_config(args.config), args)
    if args.midi_glob:
        pieces, rc = _read_midi_corpus(args.midi_glob, args.labels)
        if rc:
            return rc
        infer = not args.no_infer_labels
    else:
        pieces = synth_corpus(args.synthetic_pieces, n_bars=32,
                              seed=cfg.train.seed, meter=cfg.midi.meter)
        infer = False  # synthetic pieces carry ground-truth labels
    ds = PianoRollDataset.from_corpus(pieces, cfg.midi, cfg.model.num_bars,
                                      infer_labels=infer)
    ds.save_npy(args.out)
    print(f"wrote {len(ds)} windows of {cfg.model.num_bars} bars to {args.out}")
    return 0


def cmd_train(args) -> int:
    import jax
    from musicvae_tpu import checkpoints
    from musicvae_tpu.config import get_config
    from musicvae_tpu.data import PianoRollDataset, synth_corpus
    from musicvae_tpu.parallel import make_mesh
    from musicvae_tpu.train import GracefulStop, create_state, train
    from musicvae_tpu.utils import MetricsLogger

    cfg = _apply_midi_overrides(get_config(args.config), args)
    import dataclasses
    # architecture-width overrides (capacity sweeps by CLI — the round-5
    # MXU lever study; the checkpoint stores the EFFECTIVE config, so
    # resume/generate/describe need no re-passing)
    model_overrides = {k: tuple(int(c) for c in v.split(","))
                       for k, v in (("enc_channels", args.enc_channels),
                                    ("dec_channels", args.dec_channels))
                       if v is not None}
    if model_overrides:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    **model_overrides))
    overrides = {k: v for k, v in (
        ("num_steps", args.steps),
        ("batch_size", args.batch_size),
        ("beta_schedule", args.beta_schedule),
        ("beta_cycle_steps", args.beta_cycle_steps),
        ("beta_warmup_steps", args.beta_warmup_steps),
        ("free_bits", args.free_bits),
        ("learning_rate", args.lr),
        ("lr_schedule", args.lr_schedule),
        ("lr_warmup_steps", args.lr_warmup_steps),
        ("lr_min_ratio", args.lr_min_ratio),
        ("grad_clip_norm", args.grad_clip),
        ("ema_decay", args.ema_decay),
        ("eval_every", args.eval_every),
        ("eval_batches", args.eval_batches),
        ("log_every", args.log_every),
        ("ckpt_every", args.ckpt_every),
        ("holdout_frac", args.holdout_frac),
        ("transpose_aug", args.transpose_aug),
        ("corpus_layout", args.corpus_layout),
    ) if v is not None}
    if overrides:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **overrides))
    # NOTE: data ingestion happens BELOW, after the resume block — on
    # --resume the checkpoint's config wins (including its MidiSpec: a
    # run trained with --meter 3/4 must re-tensorize its corpus on the
    # 3/4 grid even when the flag is not re-passed), so the corpus can
    # only be read once cfg is final. The cfg-INDEPENDENT existence
    # check stays up front: a typo'd path must error before make_manager
    # / MetricsLogger construct checkpoint and log directories.
    if args.data and not os.path.exists(args.data):
        print(f"error: --data {args.data} does not exist", file=sys.stderr)
        return 2
    manager = checkpoints.make_manager(args.ckpt_dir, cfg.train.ckpt_keep)
    logger = MetricsLogger(args.log_dir)
    state = None
    if args.resume and manager.latest_step() is not None:
        # the restore TEMPLATE must be built from the CHECKPOINT's config,
        # not the CLI-side one: the optimizer-state pytree depends on the
        # training spec (a cosine lr schedule carries a step-count leaf a
        # constant lr does not), so a template from the wrong config makes
        # every step unrestorable (looks like corruption)
        ckpt_cfg = checkpoints.restore_config(manager)
        if (overrides.get("lr_schedule", ckpt_cfg.train.lr_schedule)
                != ckpt_cfg.train.lr_schedule):
            print(f"error: cannot change --lr-schedule on resume (the "
                  f"checkpoint was trained with "
                  f"{ckpt_cfg.train.lr_schedule!r}; its optimizer state "
                  f"has that schedule's structure)", file=sys.stderr)
            return 2
        _, template = create_state(ckpt_cfg)
        state, cfg = checkpoints.restore(manager, template)
        # explicit MIDI-ingestion flags (--meter/--max-events/...) apply
        # over the restored config too — same checkpoint-wins-with-CLI-
        # override semantics as the train overrides below
        cfg = _apply_midi_overrides(cfg, args)
        # the checkpoint's config wins by default, but explicit CLI flags
        # must still apply (e.g. --resume --steps 500 extends the run)
        if overrides:
            cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                        **overrides))
            print(f"resumed with CLI overrides: {overrides}",
                  file=sys.stderr)
            # EMA toggled across the resume: align the state structure
            # with the new config (on: start the average at the resume
            # point; off: drop the stale average)
            if cfg.train.ema_decay > 0 and state.ema_params is None:
                # copied — aliased buffers would be donated twice by the
                # jitted step (see create_state)
                state = state.replace(ema_params=jax.tree.map(
                    jax.numpy.copy, state.params))
                print("ema enabled on resume: average starts at the "
                      "resumed params", file=sys.stderr)
            elif cfg.train.ema_decay <= 0 and state.ema_params is not None:
                state = state.replace(ema_params=None)
        # report the step actually restored — after a corrupt-latest
        # fallback this differs from what latest_step() claimed pre-restore
        print(f"resumed from step {int(jax.device_get(state.step))}",
              file=sys.stderr)
    elif manager.latest_step() is not None:
        # a fresh run into a dir holding an older run's checkpoints would
        # have every save silently skipped (Orbax only saves steps newer
        # than the latest) and --resume would later restore the OLD run —
        # refuse instead of silently losing work
        print(f"error: {args.ckpt_dir} already contains a checkpoint at "
              f"step {manager.latest_step()}; pass --resume to continue "
              f"it or use a fresh --ckpt-dir", file=sys.stderr)
        return 2
    # data ingestion under the FINAL cfg (checkpoint-restored on resume)
    if args.data:
        ds = PianoRollDataset.load_npy(args.data)
        if ds.num_bars != cfg.model.num_bars:
            print(f"error: {args.data} has {ds.num_bars}-bar windows "
                  f"but config {cfg.name!r} trains on "
                  f"{cfg.model.num_bars}-bar windows; re-run preprocess "
                  f"with --config {cfg.name}", file=sys.stderr)
            return 2
        err = _check_cache_grid(ds, cfg, args.data)
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 2
    elif args.midi_glob:
        # one-shot workflow: tensorize the MIDI corpus in-process (the
        # same reading/validation path as preprocess, incl. the --labels
        # sidecar; unlabeled pieces get inferred labels for cond models)
        pieces, rc = _read_midi_corpus(args.midi_glob, args.labels)
        if rc:
            return 2
        ds = PianoRollDataset.from_corpus(pieces, cfg.midi,
                                          cfg.model.num_bars,
                                          infer_labels=True)
        print(f"tensorized {len(pieces)} MIDI files from "
              f"{args.midi_glob}", file=sys.stderr)
    else:
        ds = PianoRollDataset.from_corpus(
            synth_corpus(64, n_bars=32, seed=cfg.train.seed,
                         meter=cfg.midi.meter),
            cfg.midi, cfg.model.num_bars)
    mesh = make_mesh(cfg.mesh)
    # holdout split AFTER restore so a resumed run honors the checkpoint's
    # eval settings: the split is deterministic in (corpus, seed), so the
    # resumed run reproduces the original train/eval partition rather than
    # silently disabling eval and training on the former holdout
    eval_ds = None
    best_manager = None
    if cfg.train.eval_every > 0:
        ds, eval_ds = ds.split(cfg.train.holdout_frac, seed=cfg.train.seed)
        best_manager = checkpoints.make_manager(
            os.path.join(args.ckpt_dir, "best"), keep=1)
        print(f"holdout: {len(eval_ds)} eval windows "
              f"({len(ds)} train), eval every {cfg.train.eval_every} steps",
              file=sys.stderr)
    print(f"dataset: {len(ds)} windows; devices: {jax.devices()}",
          file=sys.stderr)
    data = ds
    if args.host_sharded:
        # per-host sharded loading: this process keeps only its shard and
        # streams its rows of the global batch (trainer assembles them via
        # put_host_local). Eval would need every host to hold the same
        # holdout — exactly the full-corpus contract this mode removes.
        if cfg.train.eval_every > 0:
            print("error: --host-sharded is a streaming mode without "
                  "in-training eval (hosts hold disjoint corpus shards; "
                  "the replicated eval sweep needs identical host data). "
                  "Set --eval-every 0.", file=sys.stderr)
            return 2
        from musicvae_tpu.data import HostLocalBatches
        pc = jax.process_count()
        if cfg.train.batch_size % pc:
            print(f"error: batch_size {cfg.train.batch_size} not divisible "
                  f"by {pc} processes", file=sys.stderr)
            return 2
        shard = ds.host_shard(jax.process_index(), pc, seed=cfg.train.seed)
        print(f"host shard {jax.process_index()}/{pc}: {len(shard)} windows"
              f" ({shard.bars.shape[0]} bars resident on this host)",
              file=sys.stderr)
        data = HostLocalBatches(shard.iterator(cfg.train.batch_size // pc,
                                               seed=cfg.train.seed))
    elif args.stream:
        data = ds.iterator(cfg.train.batch_size, seed=cfg.train.seed)
    # SIGTERM/SIGINT (scheduler preemption, ^C): finish the in-flight
    # dispatch, checkpoint the exact step, exit 0 with a resume hint
    with GracefulStop() as stop:
        _, state, metrics = train(
            cfg, data, mesh=mesh, ckpt_manager=manager, log_fn=logger,
            state=state, eval_data=eval_ds, best_ckpt_manager=best_manager,
            stop=stop)
    if best_manager is not None:
        best_manager.wait_until_finished()
    checkpoints.save(manager, state, cfg, wait=True)
    logger.close()
    if stop.requested:
        print(f"preempted: checkpoint saved at step "
              f"{int(jax.device_get(state.step))}; continue with --resume",
              file=sys.stderr)
        return 0
    print(f"final metrics: { {k: float(v) for k, v in metrics.items()} }")
    return 0


def cmd_eval(args) -> int:
    import jax
    import numpy as np
    from musicvae_tpu import checkpoints
    from musicvae_tpu.config import get_config
    from musicvae_tpu.data import PianoRollDataset
    from musicvae_tpu.train import create_state
    from musicvae_tpu.utils.metrics import make_eval_fn

    manager = checkpoints.make_manager(args.ckpt_dir)
    if manager.latest_step() is None:
        raise FileNotFoundError(f"no checkpoint in {args.ckpt_dir}")
    # the checkpoint knows its own config — the flag only needs to match it
    cfg = _apply_midi_overrides(checkpoints.restore_config(manager), args)
    if args.config != cfg.name:
        print(f"note: checkpoint was trained with config {cfg.name!r}; "
              f"using it", file=sys.stderr)
    model, state = create_state(cfg)
    state, _ = checkpoints.restore(manager, state)
    if args.ema:
        state = _use_ema_weights(state)
        if state is None:
            return 2
        print("scoring EMA weights", file=sys.stderr)
    if args.midi_glob:
        pieces = []
        for path in sorted(glob.glob(args.midi_glob)):
            with open(path, "rb") as f:
                pieces.append((f.read(), None, None))
        if not pieces:
            print(f"no MIDI files match {args.midi_glob}", file=sys.stderr)
            return 1
        ds = PianoRollDataset.from_corpus(pieces, cfg.midi,
                                          cfg.model.num_bars,
                                          infer_labels=True)
    elif args.data:
        ds = PianoRollDataset.load_npy(args.data)
        err = _check_cache_grid(ds, cfg, args.data)
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 2
    else:
        print("error: eval needs --data or --midi-glob", file=sys.stderr)
        return 2
    eval_fn = make_eval_fn(cfg, model)
    b = cfg.train.batch_size
    acc = {}
    weights_acc = []
    # deterministic partition sweep: every window is scored EXACTLY once —
    # a final partial batch is padded to the jitted batch shape but the
    # pad examples carry weight 0 (make_eval_fn), so means are unbiased
    # on datasets whose size is not a batch multiple
    perm = np.random.default_rng(0).permutation(len(ds)).astype(np.int32)
    n_batches = min(args.batches, -(-len(perm) // b))
    for i in range(n_batches):
        idx = perm[i * b:(i + 1) * b]
        n_real = idx.shape[0]
        w = None
        if n_real < b:   # tail: pad by wrapping, zero-weight the pad
            idx = np.resize(idx, b)
            w = np.zeros(b, np.float32)
            w[:n_real] = 1.0
            w = jax.numpy.asarray(w)
        m = jax.device_get(eval_fn(state.params,
                                   ds.batch(idx, x_dtype=np.uint8),
                                   jax.random.key(i), weights=w))
        weights_acc.append(n_real)
        for k, v in m.items():
            acc.setdefault(k, []).append(float(v))
    wt = np.asarray(weights_acc, np.float64)
    means = {k: float(np.dot(v, wt) / wt.sum()) for k, v in acc.items()}
    print(" ".join(f"{k}={v:.5g}" for k, v in sorted(means.items())))
    return 0


def _gen_spec_from_args(args):
    from musicvae_tpu.config import GenSpec
    return GenSpec(num_bars=args.bars, num_samples=args.samples,
                   interpolate=args.interpolate,
                   temperature=args.temperature,
                   sample_mode=args.sample_mode,
                   sample_temperature=args.sample_temperature)


def _load_gen_state(args, gen, what: str):
    """(cfg, model, state) from --ckpt-dir with ``gen`` applied; the
    checkpoint's config wins over --config (with a note), and a missing
    checkpoint falls back to a random init of --config with a warning.
    With ``args.ema`` the state's EMA weights replace params (error if
    the run was not trained with --ema-decay). One load path shared by
    generate and eval-gen."""
    from musicvae_tpu import checkpoints
    from musicvae_tpu.config import get_config
    from musicvae_tpu.train import create_state

    manager = checkpoints.make_manager(args.ckpt_dir)
    if manager.latest_step() is not None:
        cfg = _apply_midi_overrides(
            checkpoints.restore_config(manager).replace(gen=gen), args)
        if args.config != cfg.name:
            print(f"note: checkpoint was trained with config {cfg.name!r}; "
                  f"using it", file=sys.stderr)
        model, state = create_state(cfg)
        state, _ = checkpoints.restore(manager, state)
    else:
        cfg = _apply_midi_overrides(
            get_config(args.config).replace(gen=gen), args)
        model, state = create_state(cfg)
        print(f"warning: no checkpoint found, {what} from random init",
              file=sys.stderr)
    if getattr(args, "ema", False):
        state = _use_ema_weights(state)
        if state is None:
            return None                      # caller returns rc 2
        print("using EMA weights", file=sys.stderr)
    return cfg, model, state


def cmd_eval_gen(args) -> int:
    """Sample-quality statistics of a checkpoint's generations, optionally
    against a reference corpus (utils/genmetrics.py). Prints one JSON
    object: {"gen": stats[, "ref": stats, "compare": divergences]} — the
    numeric stand-in for the reference's listen-and-judge validation."""
    import json
    import jax
    from musicvae_tpu.generate import make_generate_fn
    from musicvae_tpu.parallel import make_mesh, replicated
    from musicvae_tpu.utils.genmetrics import (bar_stats, compare_stats,
                                               to_jsonable)

    loaded = _load_gen_state(args, _gen_spec_from_args(args),
                             what="scoring")
    if loaded is None:
        return 2
    cfg, model, state = loaded
    mesh = make_mesh(cfg.mesh)
    params = jax.device_put(state.params, replicated(mesh))
    dispatch, to_host = _make_packed_gen(make_generate_fn(cfg, model,
                                                          mesh=mesh))
    bars = to_host(dispatch(params, jax.random.key(args.seed)))
    gstats = bar_stats(bars)
    result = {"samples": int(bars.shape[0]),
              "bars_per_sample": int(bars.shape[1]),
              "gen": to_jsonable(gstats)}
    ref_ds = None
    if args.data:
        from musicvae_tpu.data import PianoRollDataset
        ref_ds = PianoRollDataset.load_npy(args.data)
        err = _check_cache_grid(ref_ds, cfg, args.data)
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 2
    elif args.midi_glob:
        from musicvae_tpu.data import PianoRollDataset
        pieces, rc = _read_midi_corpus(args.midi_glob)
        if rc:
            return rc
        # bar_stats is bar-level and window-independent: window with
        # num_bars=1 so reference pieces SHORTER than the model's window
        # (e.g. 4-bar clips vs a 16-bar hier model) still contribute
        # every bar instead of crashing on "corpus produced no windows"
        try:
            ref_ds = PianoRollDataset.from_corpus(pieces, cfg.midi, 1)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    if ref_ds is not None:
        rstats = bar_stats(np.asarray(ref_ds.bars))
        result["ref"] = to_jsonable(rstats)
        result["compare"] = to_jsonable(compare_stats(gstats, rstats))
    print(json.dumps(result))
    return 0


def cmd_generate(args) -> int:
    import jax
    from musicvae_tpu.generate import bars_to_midi, make_generate_fn

    loaded = _load_gen_state(args, _gen_spec_from_args(args),
                             what="generating")
    if loaded is None:
        return 2
    cfg, model, state = loaded
    from musicvae_tpu.parallel import make_mesh, replicated
    mesh = make_mesh(cfg.mesh)
    params = jax.device_put(state.params, replicated(mesh))
    gen = make_generate_fn(cfg, model, mesh=mesh)
    kw = {}
    if args.seed_midi:
        seed_kw, err = _seed_from_midi(
            cfg, model, params, args.seed_midi, args.encode,
            args.samples, jax.random.key(args.seed))
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 2
        kw.update(seed_kw)
    elif args.encode:
        print("error: --encode needs --seed-midi", file=sys.stderr)
        return 2
    if args.interp_midi_b:
        if not (args.seed_midi and args.encode and args.interpolate):
            print("error: --interp-midi-b morphs between two encoded "
                  "pieces; it needs --seed-midi, --encode and "
                  "--interpolate", file=sys.stderr)
            return 2
        kw_b, err = _seed_from_midi(
            cfg, model, params, args.interp_midi_b, True, args.samples,
            jax.random.fold_in(jax.random.key(args.seed), 1))
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 2
        # B's encoded posterior pins the slerp END (generate/sampler
        # latent_path z1 / the hier phrase-identity morph z_phrase1);
        # B's seed bar is discarded — the sweep STARTS from A's material
        if "z0" in kw_b:
            kw["z1"] = kw_b["z0"]
        if "z_phrase0" in kw_b:
            kw["z_phrase1"] = kw_b["z_phrase0"]
    if cfg.model.kind == "cond" and (args.chord is not None
                                     or args.key is not None):
        import jax.numpy as jnp
        b, n = cfg.gen.num_samples, cfg.gen.num_bars
        if args.chord is not None:
            if not 0 <= args.chord < cfg.model.cond_chord_classes:
                print(f"error: --chord {args.chord} out of range 0.."
                      f"{cfg.model.cond_chord_classes - 1}", file=sys.stderr)
                return 2
            kw["chord"] = jnp.full((b, n), args.chord, jnp.int32)
        if args.key is not None:
            if not 0 <= args.key < cfg.model.cond_key_classes:
                print(f"error: --key {args.key} out of range 0.."
                      f"{cfg.model.cond_key_classes - 1}", file=sys.stderr)
                return 2
            kw["key_sig"] = jnp.full((b,), args.key, jnp.int32)
    dispatch, to_host = _make_packed_gen(gen)
    bars = to_host(dispatch(params, jax.random.key(args.seed), **kw))
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(min(args.write_midis, bars.shape[0])):
        path = os.path.join(args.out_dir, f"sample_{i:04d}.mid")
        with open(path, "wb") as f:
            f.write(bars_to_midi(bars[i], cfg))
    np.save(os.path.join(args.out_dir, "rolls.npy"), bars)
    print(f"generated {bars.shape[0]} x {bars.shape[1]} bars -> {args.out_dir}")
    return 0


def _make_packed_gen(gen):
    """Wrap a generation fn so only 1-bit-packed rolls cross the
    device→host link. Generated rolls are binary uint8, so packing on
    device cuts the transfer 8×. On remote-TPU links the pull dominates
    per-request latency (one axon-tunnel session measured 48.5 ms raw
    pull vs 3.3 ms dispatch-only for a 4×16-bar request; tunnel speed
    varies — the re-driven end-to-end effect on a calmer session was
    p50 59→50 ms and 16.7→20.0 req/s on a 24-request backlog).

    Returns ``(dispatch, to_host)``: ``dispatch`` jit-packs the sweep
    output on device (async — chainable with the serial and pipelined
    serve loops), ``to_host`` pulls and unpacks to uint8 bars."""
    import jax

    from musicvae_tpu.ops.pack import pack_bits, unpack_bits_np

    dispatch = jax.jit(lambda params, key, **kw: pack_bits(
        gen(params, key, **kw)))

    def to_host(dev) -> np.ndarray:
        return unpack_bits_np(np.asarray(dev))

    return dispatch, to_host


def _seed_from_midi(cfg, model, params, path: str, encode: bool,
                    num_samples: int, key):
    """Seed-bar (and, with ``encode``, encoded-latent) kwargs for the
    generation sweep from a real MIDI file (SURVEY §3.3: prev_bar = seed,
    'zeros or a real bar'). Returns (kwargs, error_message_or_None).

    The LAST bar of the file becomes the first prev-bar conditioning for
    every sample; with ``encode`` the last ``model.num_bars``-bar window
    (zero-padded at the front if the piece is shorter) is encoded and a
    per-sample posterior draw pins the first phrase's latent (z0 /
    z_phrase0) — continuation from the music itself rather than the prior.
    """
    import jax
    import jax.numpy as jnp
    from musicvae_tpu.midi import tensorize

    with open(path, "rb") as f:
        data = f.read()
    bars = tensorize.corpus_to_bars([data], cfg.midi, as_uint8=True)[0]
    if bars.shape[0] == 0:
        return {}, f"{path} contains no bars after tensorization"
    if not cfg.model.use_prev_bar and not encode:
        print(f"warning: config {cfg.name!r} has use_prev_bar=False — the "
              f"seed bar does not condition the decoder; use --encode to "
              f"seed through the latent instead", file=sys.stderr)
    seed_bar = jnp.broadcast_to(
        jnp.asarray(bars[-1], jnp.uint8)[None],
        (num_samples,) + bars.shape[1:])
    kw = {"seed_bar": seed_bar}
    if encode:
        from musicvae_tpu.generate import make_encode_fn
        nb = cfg.model.num_bars
        window = bars[-nb:]
        if window.shape[0] < nb:
            window = np.concatenate(
                [np.zeros((nb - window.shape[0],) + window.shape[1:],
                          np.uint8), window], axis=0)
        x = jnp.broadcast_to(
            jnp.asarray(window, jnp.float32)[None],
            (num_samples, nb) + window.shape[1:])
        ekw = {}
        if cfg.model.kind == "cond":
            from musicvae_tpu.midi import labels as labels_mod
            hists = labels_mod.bar_pc_histograms(window)
            k = labels_mod.key_from_hist(hists.sum(0))
            c = labels_mod.chord_from_hist(hists.sum(0), fallback=k)
            ekw = {"chord": jnp.full((num_samples, nb), c, jnp.int32),
                   "key_sig": jnp.full((num_samples,), k, jnp.int32)}
        kw.update(make_encode_fn(cfg, model)(params, x, key, **ekw))
    return kw, None


def cmd_reconstruct(args) -> int:
    """MIDI in → encode → posterior sample → teacher-forced decode →
    binarize → MIDI out (the reference's eval-time reconstruct), plus
    cell-level P/R/F1 of the reconstruction against the input roll."""
    import jax
    import jax.numpy as jnp
    from musicvae_tpu import checkpoints
    from musicvae_tpu.generate import bars_to_midi, reconstruct_fn
    from musicvae_tpu.midi import tensorize
    from musicvae_tpu.train import create_state

    manager = checkpoints.make_manager(args.ckpt_dir)
    if manager.latest_step() is None:
        print(f"error: no checkpoint in {args.ckpt_dir}; reconstruct needs "
              f"a trained model", file=sys.stderr)
        return 2
    cfg = _apply_midi_overrides(checkpoints.restore_config(manager), args)
    if args.config != cfg.name:
        print(f"note: checkpoint was trained with config {cfg.name!r}; "
              f"using it", file=sys.stderr)
    model, state = create_state(cfg)
    state, _ = checkpoints.restore(manager, state)
    if args.ema:
        state = _use_ema_weights(state)
        if state is None:
            return 2
        print("using EMA weights", file=sys.stderr)
    rec = reconstruct_fn(cfg, model)

    paths = sorted(glob.glob(args.midi_glob))
    if not paths:
        print(f"no MIDI files match {args.midi_glob}", file=sys.stderr)
        return 1
    os.makedirs(args.out_dir, exist_ok=True)
    nb = cfg.model.num_bars
    lo, hi = cfg.midi.pitch_lo, cfg.midi.pitch_hi
    for path in paths:
        with open(path, "rb") as f:
            data = f.read()
        bars = tensorize.corpus_to_bars([data], cfg.midi, as_uint8=True)[0]
        n = bars.shape[0]
        if n == 0:
            print(f"warning: {path} has no bars; skipped", file=sys.stderr)
            continue
        pad = (-n) % nb
        if pad:
            bars = np.concatenate(
                [bars, np.zeros((pad,) + bars.shape[1:], np.uint8)], axis=0)
        ckw = {}
        if cfg.model.kind == "cond":
            from musicvae_tpu.midi import labels as labels_mod
            hists = labels_mod.bar_pc_histograms(bars)
            ksig = labels_mod.key_from_hist(hists.sum(0))
        # fixed [1, nb, T, P] batch shape: ONE compile, then a dispatch
        # per window (window counts vary per file; a [W, ...] batch would
        # recompile for every distinct W — minutes each on remote-compile
        # TPU setups)
        outs = []
        for w in range(bars.shape[0] // nb):
            win = bars[w * nb:(w + 1) * nb]
            x = jnp.asarray(win, jnp.float32)[None]
            if cfg.model.kind == "cond":
                from musicvae_tpu.midi import labels as labels_mod
                c = labels_mod.chord_from_hist(
                    hists[w * nb:(w + 1) * nb].sum(0), fallback=ksig)
                ckw = {"chord": jnp.full((1, nb), c, jnp.int32),
                       "key_sig": jnp.full((1,), ksig, jnp.int32)}
            outs.append(np.asarray(
                rec(state.params, x, jax.random.key(args.seed + w), **ckw)))
        roll = np.concatenate([o[0] for o in outs], axis=0)[:n]
        # cell-level reconstruction quality vs the input, crop-masked
        t = bars[:n, :, lo:hi].astype(np.float64)
        r = roll[:n, :, lo:hi].astype(np.float64)
        tp = float((r * t).sum())
        prec = tp / max(r.sum(), 1.0)
        recall = tp / max(t.sum(), 1.0)
        f1 = 2 * prec * recall / max(prec + recall, 1e-9)
        out_path = os.path.join(
            args.out_dir,
            os.path.splitext(os.path.basename(path))[0] + ".recon.mid")
        with open(out_path, "wb") as f:
            f.write(bars_to_midi(roll.astype(np.uint8), cfg))
        print(f"{path}: {n} bars -> {out_path}  "
              f"precision={prec:.3f} recall={recall:.3f} f1={f1:.3f}")
    return 0


def cmd_describe(args) -> int:
    """Inspect a checkpoint directory without loading any weights onto a
    device: the embedded config, available/quarantined steps, the best-
    checkpoint sidecar if present, and the parameter count — the ops
    question "what exactly is in this directory?" answered read-only."""
    import glob as glob_mod
    import json

    # NOTE: when run as the CLI binary, main() pins jax_platforms=cpu for
    # this subcommand BEFORE anything touches jax (make_manager's first
    # jax call would otherwise initialize the ambient TPU backend —
    # connecting to, and with the tunnel down hanging on, the very device
    # this command promises never to touch). In-process callers keep
    # their ambient backend: describe only does metadata reads and
    # eval_shape, both backend-agnostic, and mutating global jax config
    # under a live caller would be a surprising side effect.
    import jax

    from musicvae_tpu import checkpoints
    from musicvae_tpu.models import init_params

    # inspect-only means CREATE nothing: make_manager would makedirs the
    # path (littering the filesystem on a typo'd --ckpt-dir, or dying on
    # a read-only mount) — refuse missing directories up front instead
    if not os.path.isdir(args.ckpt_dir):
        print(f"error: no checkpoint in {args.ckpt_dir}", file=sys.stderr)
        return 2
    manager = checkpoints.make_manager(args.ckpt_dir)
    steps = sorted(manager.all_steps())
    if not steps:
        print(f"error: no checkpoint in {args.ckpt_dir}", file=sys.stderr)
        return 2
    cfg = checkpoints.restore_config(manager)
    # param count from shapes only (eval_shape — no FLOPs, no weights)
    shapes = jax.eval_shape(lambda k: init_params(cfg, k)[1],
                            jax.random.key(0))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(shapes))
    quarantined = sorted(
        os.path.basename(p)
        for pat in ("*.corrupt", "*.corrupt.*")  # incl. the .N collision
        for p in glob_mod.glob(os.path.join(args.ckpt_dir, pat)))  # names
    info = {
        "config": cfg.name,
        "model_kind": cfg.model.kind,
        "params": n_params,
        "steps": steps,
        "latest_step": steps[-1],
        "quarantined": quarantined,
        "roll": f"{cfg.midi.steps_per_bar}x{cfg.midi.num_pitches}",
        # the tensorization meter — the ORIGINAL declared signature (a
        # --meter 6/8 run reports 6/8, not the grid-equivalent 3/4), the
        # conv-stem family (parity "conv" vs the MXU "patch" layout), and
        # the temporal core (parity "gru" vs the non-recurrent "attn")
        "meter": "{}/{}".format(*cfg.midi.meter),
        "stem": cfg.model.stem,
        "temporal": cfg.model.temporal,
        "window_bars": cfg.model.num_bars,
        "dtype": cfg.model.dtype,
        # from the embedded config, not the weights: shape-only inspect
        "ema": cfg.train.ema_decay > 0,
    }
    best_sidecar = os.path.join(args.ckpt_dir, "best", "best_metric.json")
    if os.path.exists(best_sidecar):
        try:
            with open(best_sidecar) as f:
                info["best"] = json.load(f)
        except Exception:
            info["best"] = "unreadable"
    print(json.dumps(info, indent=2))
    return 0


def cmd_convert(args) -> int:
    """torch state-dict ↔ Orbax checkpoint conversion (SURVEY §3.5's
    parity clause at the CLI: "ELBO-equivalent reconstructions from the
    same checkpoints"). One direction per invocation:

      convert --from-torch model.pt --config c2_gru_4bar --out ckpt_dir
      convert --to-torch ckpt_dir --out model.pt
      convert --from-safetensors model.safetensors --config … --out dir
      convert --to-safetensors ckpt_dir --out model.safetensors

    --from-torch accepts a bare state_dict or a reference-style
    {'model': state_dict, ...} bundle; optimizer moments do NOT convert
    (torch Adam state has no optax pytree correspondence) — the written
    checkpoint carries a fresh optimizer at --step (default 0).
    safetensors files use the SAME canonical tensor names as the torch
    export (one naming, three formats), so any safetensors tool and the
    torch oracle agree on what each tensor is.
    """
    import jax
    import jax.numpy as jnp
    from musicvae_tpu import checkpoints
    from musicvae_tpu.train import create_state

    sources = [args.from_torch, args.to_torch,
               getattr(args, "from_safetensors", None),
               getattr(args, "to_safetensors", None)]
    if sum(bool(s) for s in sources) != 1:
        print("error: convert needs exactly one of --from-torch / "
              "--to-torch / --from-safetensors / --to-safetensors",
              file=sys.stderr)
        return 2

    def _import(sd, src):
        from musicvae_tpu.checkpoints.torch_convert import \
            torch_state_dict_to_flax
        from musicvae_tpu.config import get_config
        cfg = get_config(args.config)
        params = torch_state_dict_to_flax(sd, cfg)
        _, state = create_state(cfg)
        # validate against the config's own shapes BEFORE writing: a
        # state dict from a differently-sized model would otherwise
        # produce a checkpoint that only fails much later, at load time
        mismatches = []
        jax.tree_util.tree_map_with_path(
            lambda path, want, got: mismatches.append(
                f"{jax.tree_util.keystr(path)}: file has "
                f"{np.asarray(got).shape}, config {cfg.name} expects "
                f"{np.asarray(want).shape}")
            if np.asarray(got).shape != np.asarray(want).shape else None,
            state.params, params)
        if mismatches:
            print("error: state dict does not match config "
                  f"{cfg.name!r}:\n  " + "\n  ".join(mismatches[:8]),
                  file=sys.stderr)
            return 2
        state = state.replace(
            params=jax.tree.map(jnp.asarray, params),
            step=jnp.asarray(args.step, jnp.int32))
        mgr = checkpoints.make_manager(args.out, keep=1)
        checkpoints.save(mgr, state, cfg, wait=True)
        n = sum(np.asarray(p).size for p in jax.tree.leaves(params))
        print(f"converted {src} -> {args.out} "
              f"(config {cfg.name}, {n} params, step {args.step})")
        return 0

    def _export(ckpt_dir):
        from musicvae_tpu.checkpoints.torch_convert import \
            flax_params_to_torch_state_dict
        mgr = checkpoints.make_manager(ckpt_dir)
        if mgr.latest_step() is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        cfg = checkpoints.restore_config(mgr)
        _, state = create_state(cfg)
        state, _ = checkpoints.restore(mgr, state)
        export_params = state.params
        if getattr(args, "ema", False):
            swapped = _use_ema_weights(state)
            if swapped is None:
                return None                  # caller returns rc 2
            export_params = swapped.params
        sd = flax_params_to_torch_state_dict(
            jax.device_get(export_params), cfg)
        return sd, cfg, int(jax.device_get(state.step))

    if args.from_torch:
        import torch
        sd = torch.load(args.from_torch, map_location="cpu",
                        weights_only=True)
        if isinstance(sd, dict) and "model" in sd \
                and not any("." in k for k in sd):
            sd = sd["model"]        # reference-style training bundle
        return _import(sd, args.from_torch)
    elif args.from_safetensors:
        from safetensors.torch import load_file
        return _import(load_file(args.from_safetensors),
                       args.from_safetensors)
    elif args.to_torch:
        import torch
        exported = _export(args.to_torch)
        if exported is None:
            return 2
        sd, cfg, step = exported
        torch.save(sd, args.out)
        print(f"converted {args.to_torch} (config {cfg.name}, step "
              f"{step}) -> {args.out} ({len(sd)} tensors)")
    else:
        from safetensors.torch import save_file
        exported = _export(args.to_safetensors)
        if exported is None:
            return 2
        sd, cfg, step = exported
        save_file({k: v.contiguous() for k, v in sd.items()}, args.out,
                  metadata={"config": cfg.name, "step": str(step),
                            "format": "musicvae_tpu/torch-names"})
        print(f"converted {args.to_safetensors} (config {cfg.name}, "
              f"step {step}) -> {args.out} ({len(sd)} tensors)")
    return 0


def cmd_serve(args) -> int:
    """Persistent generation service over line-delimited JSON.

    Protocol (one JSON object per line on stdin → one per line on stdout):
      request:  {"id": any, "seed": int, "chord": int?, "key": int?,
                 "seed_midi_b64": str?}
      response: {"id": any, "midi_b64": [str, ...], "density": float,
                 "latency_ms": float}
      error:    {"id": any, "error": str}
      stats:    {"id": any, "cmd": "stats"} → {"id": any, "stats":
                 {served, errors, requests, step, config, samples, bars,
                  uptime_s}} — live in-band introspection (hot reloads
                 show up as ``step`` changes)
      reload:   {"id": any, "cmd": "reload"} → {"id": any, "reloaded":
                 step|null, "step": current} — push-style checkpoint
                 reload (a training host can POST this right after a
                 save instead of waiting out the --reload-every poll)

    ``chord``/``key`` (cond models) never change the trace signature —
    omitted fields are filled with host-random classes so the program
    compiled at startup serves every conditioned request.
    ``seed_midi_b64`` (base64 SMF bytes) seeds the prev-bar conditioning
    with the file's last bar; it uses a second trace, pre-compiled at
    startup under --warm-seed.
    EOF on stdin ends the service. The generation program compiles once at
    startup for the fixed (--samples, --bars) shape; every request is then
    a single on-device sweep + MIDI export — the serving path the
    reference's script-per-run workflow cannot offer. Logs go to stderr;
    stdout carries only protocol lines.

    ``--port N`` swaps the transport for a threaded TCP server speaking
    the identical protocol to many concurrent clients, multiplexed onto
    the same single compiled program (see ``_serve_socket``).

    ``--coalesce W`` enables dynamic batching: up to W queued requests
    (either transport) run as ONE device dispatch through a single
    uniform-signature program — amortizing the per-dispatch floor and
    eliminating the seeded-request second trace; per-seed output is
    bit-identical to per-request dispatch (docs/SERVING.md).

    ``--reload-every SECS`` polls the checkpoint directory and hot-swaps
    newer params into the running service with zero retracing — the
    train→serve loop without a restart (see ``_start_reload_watcher``).

    ``--pipeline`` overlaps device compute with host MIDI encoding under
    load (depth 1): request i+1's sweep is dispatched — JAX dispatch is
    async — before request i's bars are pulled to host and encoded.
    Responses stay in request order, and an idle service still answers
    each request immediately (the pipeline only fills when a next request
    is already waiting on stdin). It is OFF by default because on the
    axon tunnel it measures slightly SLOWER than serial handling (3
    alternating trials, 24×(32×16-bar) requests: serial 3.1/3.0/2.7
    req/s vs pipelined 2.7/2.5/2.4 — the device→host pull shares the
    tunnel with the next dispatch, so the overlap buys nothing and adds
    contention), and because the vectorized SMF writer
    (midi/smf.py write_smf_arrays) already cut host encode ~19× so the
    sweep dominates. On hardware with truly concurrent DMA the flag
    is the right default; the A/B is one flag away.
    """
    import base64
    import threading
    import time

    import jax
    from musicvae_tpu import checkpoints
    from musicvae_tpu.config import GenSpec
    from musicvae_tpu.generate import make_generate_fn
    from musicvae_tpu.train import create_state

    # flag validation FIRST: a bad invocation must not pay the full
    # checkpoint restore + device upload (minutes on remote-TPU setups)
    # before hearing about it
    if args.coalesce < 1:
        print("error: --coalesce must be >= 1", file=sys.stderr)
        return 2
    if args.coalesce > 1 and args.pipeline:
        print("error: --pipeline and --coalesce are mutually exclusive "
              "(coalescing already overlaps host encode with the next "
              "batch's device sweep)", file=sys.stderr)
        return 2

    gen_spec = GenSpec(num_bars=args.bars, num_samples=args.samples,
                       interpolate=args.interpolate,
                       sample_mode=args.sample_mode,
                       sample_temperature=args.sample_temperature)
    manager = checkpoints.make_manager(args.ckpt_dir)
    if manager.latest_step() is None:
        print(f"error: no checkpoint in {args.ckpt_dir}; serve needs a "
              f"trained model", file=sys.stderr)
        return 2
    cfg = _apply_midi_overrides(
        checkpoints.restore_config(manager).replace(gen=gen_spec), args)
    model, state = create_state(cfg)
    state, _ = checkpoints.restore(manager, state)
    if args.ema:
        state = _use_ema_weights(state)
        if state is None:
            return 2
    serving_params = state.params
    from musicvae_tpu.parallel import make_mesh, replicated
    mesh = make_mesh(cfg.mesh)
    # params live in a mutable store so the reload watcher (below) can
    # hot-swap them: same pytree structure/shapes → the compiled programs
    # keep serving with ZERO retracing, in-flight dispatches keep the
    # params object they were called with (swap is GIL-atomic)
    store = {"params": jax.device_put(serving_params, replicated(mesh)),
             "step": int(jax.device_get(state.step))}
    gen = make_generate_fn(cfg, model, mesh=mesh)

    def cond_kwargs(req, seed: int) -> dict:
        """Concrete chord/key arrays for cond models — ALWAYS concrete so
        the jit trace signature is identical whether or not a request
        pins them (None vs array is a different signature: the first
        conditioned request would otherwise trigger a full mid-service
        recompile — minutes on remote-compile TPU setups). An omitted
        field falls back to host-side random classes, matching
        make_generate_fn's on-device default distribution."""
        kw = {}
        if cfg.model.kind != "cond":
            return kw
        import jax.numpy as jnp
        b, n = cfg.gen.num_samples, cfg.gen.num_bars
        rng = np.random.default_rng(seed)
        if req.get("chord") is not None:
            c = int(req["chord"])
            if not 0 <= c < cfg.model.cond_chord_classes:
                raise ValueError(f"chord {c} out of range")
            kw["chord"] = jnp.full((b, n), c, jnp.int32)
        else:
            kw["chord"] = jnp.asarray(rng.integers(
                0, cfg.model.cond_chord_classes, (b, n)), jnp.int32)
        if req.get("key") is not None:
            kv = int(req["key"])
            if not 0 <= kv < cfg.model.cond_key_classes:
                raise ValueError(f"key {kv} out of range")
            kw["key_sig"] = jnp.full((b,), kv, jnp.int32)
        else:
            kw["key_sig"] = jnp.asarray(rng.integers(
                0, cfg.model.cond_key_classes, (b,)), jnp.int32)
        return kw

    def request_kwargs(req, seed: int) -> dict:
        """Full per-request generate kwargs: cond conditioning plus the
        optional seed-bar from an inline base64 SMF file (both transports
        share this; raising here surfaces in-band under the request id)."""
        kw = cond_kwargs(req, seed)
        if req.get("seed_midi_b64"):
            import jax.numpy as jnp
            from musicvae_tpu.midi import tensorize
            sb = tensorize.corpus_to_bars(
                [base64.b64decode(req["seed_midi_b64"])], cfg.midi,
                as_uint8=True)[0]
            if sb.shape[0] == 0:
                raise ValueError("seed MIDI contains no bars")
            kw["seed_bar"] = jnp.broadcast_to(
                jnp.asarray(sb[-1], jnp.uint8)[None],
                (args.samples,) + sb.shape[1:])
        return kw

    def request_arrays(req, seed: int):
        """Uniform concrete (seed_bar, chord, key_sig) np arrays for the
        coalesced program — zeros where the request (or model kind) has
        no value, which is exactly the unseeded/unconditioned semantic
        (see make_coalesced_generate_fn). Validation (chord/key ranges,
        seed-MIDI decode) is shared with the per-request path via
        request_kwargs, so both dispatch modes reject identically."""
        kw = request_kwargs(req, seed)
        b, n = cfg.gen.num_samples, cfg.gen.num_bars
        t, p = cfg.midi.steps_per_bar, cfg.midi.num_pitches
        sb = np.asarray(kw.get("seed_bar",
                               np.zeros((b, t, p), np.uint8)), np.uint8)
        ch = np.asarray(kw.get("chord",
                               np.zeros((b, n), np.int32)), np.int32)
        ks = np.asarray(kw.get("key_sig",
                               np.zeros((b,), np.int32)), np.int32)
        return sb, ch, ks

    t0 = time.perf_counter()
    if args.coalesce > 1:
        # ONE uniform trace (keys, seed_bars, chords, key_sigs — all
        # concrete) serves every request mix; nothing else to warm
        from musicvae_tpu.generate import make_coalesced_generate_fn
        coal = make_coalesced_generate_fn(cfg, model, mesh=mesh)
        runner = _CoalescedRunner(coal, store, cfg, args.coalesce)
        runner.warm()
        dispatch = to_host = None
    else:
        # serve pulls 1-bit-packed rolls (8x fewer host-link bytes — the
        # pull dominates request latency on remote-TPU links, see
        # _make_packed_gen)
        runner = None
        dispatch, to_host = _make_packed_gen(gen)
        warm = dispatch(store["params"], jax.random.key(0),
                        **cond_kwargs({}, 0))
        float(np.asarray(warm).sum())       # fence: compile finishes here
        if args.warm_seed:
            # seeded requests (seed_midi_b64) use a second trace (seed_bar
            # array vs None); pre-compile it so no request ever waits on a
            # recompile (compiles are minutes-slow on remote-compile
            # setups)
            import jax.numpy as jnp
            zb = jnp.zeros((args.samples, cfg.midi.steps_per_bar,
                            cfg.midi.num_pitches), jnp.uint8)
            warm = dispatch(store["params"], jax.random.key(0),
                            seed_bar=zb, **cond_kwargs({}, 0))
            float(np.asarray(warm).sum())
    banner = (f"serving {cfg.name} (step {store['step']})"
              f": {args.samples}x{args.bars} bars/request, compiled in "
              f"{time.perf_counter() - t0:.1f}s")
    if args.coalesce > 1:
        banner += f", coalescing up to {args.coalesce} requests/dispatch"

    if args.ema:
        banner += ", EMA weights"
    reload_once = _make_reload_once(manager, state, mesh, store,
                                    use_ema=args.ema)
    stop_reload = threading.Event()
    if args.reload_every > 0:
        _start_reload_watcher(args.reload_every, reload_once, stop_reload)
    try:
        if args.port is not None:
            return _serve_socket(args, cfg, dispatch, to_host, store,
                                 request_kwargs, banner,
                                 runner=runner,
                                 request_arrays=request_arrays,
                                 reload_once=reload_once)
        if args.coalesce > 1:
            return _serve_stdin_coalesced(args, cfg, runner,
                                          request_arrays, banner,
                                          reload_once)
        return _serve_stdin_serial(args, cfg, dispatch, to_host, store,
                                   request_kwargs, banner, reload_once)
    finally:
        stop_reload.set()


def _serve_stdin_serial(args, cfg, dispatch, to_host, store,
                        request_kwargs, banner: str, reload_once) -> int:
    """Default stdin transport: one request, one device dispatch (see
    cmd_serve's docstring for the protocol and the --pipeline A/B)."""
    import base64
    import json
    import queue as queue_mod
    import threading
    import time

    import jax

    from musicvae_tpu.generate import bars_to_midi

    print(f"{banner}; reading JSON lines on stdin", file=sys.stderr)

    # stdin feeds a queue from a reader thread so the main loop can see
    # whether a next request is ALREADY waiting (pipeline fill) without
    # ever blocking a ready response on more input arriving
    inq: "queue_mod.Queue" = queue_mod.Queue(maxsize=256)

    def _read_stdin():
        for ln in sys.stdin:
            inq.put(ln)
        inq.put(None)                       # EOF sentinel

    threading.Thread(target=_read_stdin, daemon=True).start()

    served = 0
    errors = 0
    n_requests = 0  # parsed requests (the default-seed counter; ``served``
                    # lags dispatch by one while the pipeline is full)
    pending = []    # at most one in-flight (rid, device_bars, t_req)
    t_serve0 = None
    t_start = time.perf_counter()

    def _flush():
        """Pull the in-flight sweep to host, encode, and answer. Device
        errors surface here and stay in-band under the request's own id."""
        nonlocal served, errors
        if not pending:
            return
        rid, dev, t_req = pending.pop()
        try:
            print(json.dumps(_gen_response(rid, to_host(dev), cfg, t_req)),
                  flush=True)
            served += 1
        except Exception as e:
            errors += 1
            print(json.dumps({"id": rid, "error": f"{type(e).__name__}: "
                                                  f"{e}"}), flush=True)

    while True:
        line = inq.get()
        if line is None:
            _flush()
            break
        line = line.strip()
        if not line:
            _flush()    # a blank line must not strand a ready pipelined
            continue    # response until more input happens to arrive
        rid = None
        try:
            req = json.loads(line)
            rid = req.get("id")
            _check_cmd(req)
            if req.get("cmd") == "stats":
                _flush()                    # responses keep request order
                print(json.dumps(_stats_response(
                    rid, cfg, store, served, errors, n_requests,
                    t_start)), flush=True)
                continue
            if req.get("cmd") == "reload":
                _flush()
                print(json.dumps({"id": rid, "reloaded": reload_once(),
                                  "step": store["step"]}), flush=True)
                continue
            seed = int(req.get("seed", n_requests))
            n_requests += 1
            kw = request_kwargs(req, seed)
            t_req = time.perf_counter()
            if t_serve0 is None:
                t_serve0 = t_req
            dev = dispatch(store["params"],
                           jax.random.key(seed), **kw)  # async
            _flush()        # encode request i while the device runs i+1
            pending.append((rid, dev, t_req))
            if not args.pipeline or inq.empty():
                _flush()    # idle (or serial mode): answer immediately
        except Exception as e:              # protocol errors stay in-band
            _flush()        # responses keep request order
            errors += 1
            print(json.dumps({"id": rid, "error": f"{type(e).__name__}: "
                                                  f"{e}"}), flush=True)
    dt = (time.perf_counter() - t_serve0) if t_serve0 is not None else 0.0
    rate = f" ({served / dt:.1f} req/s)" if served and dt > 0 else ""
    print(f"served {served} requests, {errors} errors in {dt:.1f}s{rate}",
          file=sys.stderr)
    return 0


def _gen_response(rid, bars, cfg, t_req: float) -> dict:
    """The ONE generation-response schema every transport emits: base64
    SMF per sample, density, and latency_ms measured from the caller's
    ``t_req`` (per-request dispatch time on the serial paths; the drain
    window's start on the coalesced stdin path — queue wait included
    either way). A schema change edits exactly this function."""
    import base64
    import time

    from musicvae_tpu.generate import bars_to_midi

    midis = [base64.b64encode(bars_to_midi(bars[i], cfg)).decode()
             for i in range(bars.shape[0])]
    return {"id": rid, "midi_b64": midis,
            "density": float(bars.mean()),
            "latency_ms": round(1e3 * (time.perf_counter() - t_req), 1)}


def _check_cmd(req) -> None:
    """Reject unknown ``cmd`` values in-band: a typo'd or newer-client
    command must not silently fall through to the generation path and
    burn a device sweep answering MIDI where stats were expected."""
    cmd = req.get("cmd")
    if cmd is not None and cmd not in ("stats", "reload"):
        raise ValueError(f"unknown cmd {cmd!r} (expected 'stats' or "
                         f"'reload')")


def _stats_response(rid, cfg, store, served: int, errors: int,
                    requests: int, t_start: float) -> dict:
    """In-band service introspection: a request line ``{"cmd": "stats"}``
    answers with live counters instead of music — load balancers and
    training dashboards can watch a service (and see hot reloads land via
    ``step``) without side channels or log scraping."""
    import time

    return {"id": rid, "stats": {
        "served": served, "errors": errors, "requests": requests,
        "step": store["step"], "config": cfg.name,
        "samples": cfg.gen.num_samples, "bars": cfg.gen.num_bars,
        "uptime_s": round(time.perf_counter() - t_start, 1)}}


class _CoalescedRunner:
    """Host side of serve's dynamic batching: stacks up to ``width``
    requests' (seed, arrays) into the one coalesced device program
    (make_coalesced_generate_fn), padding short batches to a fixed
    width so jit never retraces mid-service. Pad slots reuse seed 0 +
    zeros and are sliced off before the host unpack, so they cost device
    FLOPs only — the price of the single-trace guarantee.

    TWO trace tiers, both compiled at startup (``warm``): W=1 and
    W=width. A lone request (the idle-service common case) dispatches
    through the W=1 program at 1× sweep FLOPs instead of paying width×
    for padding; any batch of 2+ pads to the full width. Both tiers are
    shape-specializations of the SAME jitted function over the SAME
    per-slot sweep body, so slot outputs are bit-identical across tiers
    and vs the single-request program (asserted in tests/test_cli.py)."""

    def __init__(self, coal, store, cfg, width: int):
        self.coal, self.store, self.cfg, self.width = \
            coal, store, cfg, width
        b = cfg.gen.num_samples
        t, p = cfg.midi.steps_per_bar, cfg.midi.num_pitches
        self._zero = (np.zeros((b, t, p), np.uint8),
                      np.zeros((b, cfg.gen.num_bars), np.int32),
                      np.zeros((b,), np.int32))

    def warm(self) -> None:
        # compile both tiers up front: no request ever waits on a trace
        self.run([(0, self._zero)])
        if self.width > 1:
            self.run([(0, self._zero)] * 2)

    def run(self, items):
        """items: [(seed, (seed_bar, chord, key_sig)), ...] with
        len <= width → list of unpacked bars arrays [B,N,T,P] uint8,
        one per item, in order."""
        import jax
        import jax.numpy as jnp

        from musicvae_tpu.ops.pack import unpack_bits_np

        n = len(items)
        pad = (1 if n == 1 else self.width) - n
        seeds = [s for s, _ in items] + [0] * pad
        stacks = [np.stack([a[i] for _, a in items]
                           + [self._zero[i]] * pad) for i in range(3)]
        # key data built host-side: exactly jax.random.key(seed)'s x32
        # layout ([0, seed mod 2^32]) for ANY Python int — a 64-bit
        # client seed must neither overflow (jnp.asarray is int32) nor
        # poison the co-batched requests; parity with the serial path
        # is asserted (incl. a >2^32 seed) in the equivalence test
        kd = np.array([[0, s & 0xFFFFFFFF] for s in seeds], np.uint32)
        keys = jax.random.wrap_key_data(jnp.asarray(kd))
        # pull all width slots and slice on host: pad slots are packed
        # (1 bit/cell, ~100 KB each) so the extra bytes cost less than
        # the extra device dispatch a device-side [:n] slice would add
        packed = np.asarray(self.coal(self.store["params"], keys, *stacks))
        bars = unpack_bits_np(packed[:n])
        return [bars[i] for i in range(n)]


class _Batcher:
    """Cross-client request coalescer for the TCP transport: handler
    threads submit (seed, arrays) and block on a Future; one dispatcher
    thread drains the queue up to the runner's width and answers a whole
    batch from one device dispatch. Under concurrency the per-dispatch
    floor (~25 ms on the axon tunnel) is paid once per width requests
    instead of once per request."""

    def __init__(self, runner: _CoalescedRunner):
        import queue as queue_mod
        import threading

        self.runner = runner
        self.q: "queue_mod.Queue" = queue_mod.Queue()
        self._empty = queue_mod.Empty
        self._lock = threading.Lock()
        self._stopped = False
        threading.Thread(target=self._loop, daemon=True).start()

    def submit(self, seed: int, arrays):
        import concurrent.futures

        fut: "concurrent.futures.Future" = concurrent.futures.Future()
        # the lock orders submit against stop(): any item enqueued here
        # is FIFO-ahead of the stop sentinel, so no submission can land
        # behind it and leave its handler blocked on the Future forever
        with self._lock:
            if self._stopped:
                fut.set_exception(ConnectionError(
                    "service is shutting down"))
                return fut
            self.q.put((seed, arrays, fut))
        return fut

    def stop(self) -> None:
        """End the dispatcher thread once the server is done (in-process
        callers like the test suite would otherwise accumulate one
        parked daemon thread per service). Late submissions fail fast
        with ConnectionError instead of hanging."""
        with self._lock:
            self._stopped = True
            self.q.put(None)

    def _loop(self) -> None:
        while True:
            first = self.q.get()
            if first is None:               # stop() sentinel
                return
            items = [first]
            while len(items) < self.runner.width:
                try:
                    nxt = self.q.get_nowait()
                except self._empty:
                    break
                if nxt is None:
                    self.q.put(None)        # re-arm: drain this batch first
                    break
                items.append(nxt)
            try:
                results = self.runner.run([(s, a) for s, a, _ in items])
                for (_, _, fut), bars in zip(items, results):
                    fut.set_result(bars)
            except Exception as e:  # device errors fan out per-request
                for _, _, fut in items:
                    fut.set_exception(e)


def _serve_stdin_coalesced(args, cfg, runner, request_arrays,
                           banner: str, reload_once) -> int:
    """stdin transport under ``--coalesce W``: drain up to W already-
    queued request lines per iteration and answer them from ONE device
    dispatch. Responses keep request order; malformed requests get their
    in-band error in position without poisoning the batch; a device
    error inside a batch is reported under every affected request id.
    A ``{"cmd": "reload"}`` that lands mid-batch acts as a barrier: the
    drained batch splits around it, so generations after the reload run
    on the reloaded params — effects are strictly in request order."""
    import base64
    import json
    import queue as queue_mod
    import threading
    import time

    from musicvae_tpu.generate import bars_to_midi

    print(f"{banner}; reading JSON lines on stdin", file=sys.stderr)
    inq: "queue_mod.Queue" = queue_mod.Queue(maxsize=256)

    def _read_stdin():
        for ln in sys.stdin:
            inq.put(ln)
        inq.put(None)                       # EOF sentinel

    threading.Thread(target=_read_stdin, daemon=True).start()

    served = errors = n_requests = 0
    t_serve0 = None
    t_start = time.perf_counter()
    eof = False
    while not eof:
        lines = [inq.get()]
        while len(lines) < runner.width:
            try:
                lines.append(inq.get_nowait())
            except queue_mod.Empty:
                break
        # entry kinds: (rid, seed, arrays) generation slot;
        # (rid, None, errmsg) in-band error; (rid, "stats", None)
        entries = []
        for line in lines:
            if line is None:
                eof = True
                break
            line = line.strip()
            if not line:
                continue
            rid = None
            try:
                req = json.loads(line)
                rid = req.get("id")
                _check_cmd(req)
                if req.get("cmd") in ("stats", "reload"):
                    # snapshot the parse-time request counter: later
                    # lines in the SAME drain window are parsed before
                    # this entry is answered, and stats must report the
                    # requests seen BEFORE it (the serial semantics)
                    entries.append((rid, req["cmd"], n_requests))
                    continue
                seed = int(req.get("seed", n_requests))
                n_requests += 1
                entries.append((rid, seed, request_arrays(req, seed)))
            except Exception as e:
                entries.append((rid, None, f"{type(e).__name__}: {e}"))
        if not entries:
            continue
        t_req = time.perf_counter()
        if t_serve0 is None:
            t_serve0 = t_req
        # a reload is a BARRIER: it splits the drained batch so every
        # generation after it (even in the same drain window) runs on
        # the reloaded params — effects, like responses, are strictly
        # in request order
        groups: list = [[]]
        for e in entries:
            if e[1] == "reload":
                groups.append(e)
                groups.append([])
            else:
                groups[-1].append(e)
        for grp in groups:
            if isinstance(grp, tuple):      # the reload barrier itself
                rid = grp[0]
                try:
                    print(json.dumps(
                        {"id": rid, "reloaded": reload_once(),
                         "step": runner.store["step"]}), flush=True)
                except Exception as e:
                    errors += 1
                    print(json.dumps({"id": rid,
                                      "error": f"{type(e).__name__}: "
                                               f"{e}"}), flush=True)
                continue
            if not grp:
                continue
            ok = [(seed, arrays) for _, seed, arrays in grp
                  if seed is not None and seed != "stats"]
            try:
                results = iter(runner.run(ok) if ok else [])
                run_err = None
            except Exception as e:
                results, run_err = iter([]), f"{type(e).__name__}: {e}"
            for rid, seed, payload in grp:
                if seed == "stats":
                    print(json.dumps(_stats_response(
                        rid, cfg, runner.store, served, errors,
                        payload, t_start)), flush=True)
                elif seed is None:
                    errors += 1
                    print(json.dumps({"id": rid, "error": payload}),
                          flush=True)
                elif run_err is not None:
                    errors += 1
                    print(json.dumps({"id": rid, "error": run_err}),
                          flush=True)
                else:
                    print(json.dumps(_gen_response(
                        rid, next(results), cfg, t_req)), flush=True)
                    served += 1
    dt = (time.perf_counter() - t_serve0) if t_serve0 is not None else 0.0
    rate = f" ({served / dt:.1f} req/s)" if served and dt > 0 else ""
    print(f"served {served} requests, {errors} errors in {dt:.1f}s{rate}",
          file=sys.stderr)
    return 0


def _make_reload_once(manager, template_state, mesh, store,
                      use_ema: bool = False):
    """Hot checkpoint reload for serve: returns ``reload_once() ->
    Optional[int]`` which checks the checkpoint directory and, if a
    newer step exists, swaps its params into the shared ``store`` (and
    returns the step; None if already current) — the train→serve loop
    without a service restart. Shapes are fixed by the checkpoint's own
    config, so a reload never retraces a compiled program; requests
    dispatched before the swap finish on the params they started with.
    A step that fails to restore (e.g. caught mid-write before Orbax
    commits) raises — callers retry (watcher) or report in-band
    (``{"cmd": "reload"}``) — and NEVER quarantines anything: the
    training process owns the directory; the server is a read-only
    observer. Thread-safe (one reload at a time; push and poll modes
    can coexist)."""
    import threading

    import jax

    from musicvae_tpu import checkpoints
    from musicvae_tpu.parallel import replicated

    lock = threading.Lock()
    # only the param SHAPES are kept (the per-reload restore template is
    # rebuilt abstractly from each new step's own config): the guard
    # that a reloaded checkpoint still fits the compiled programs
    param_shapes = jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                                template_state.params)

    def reload_once():
        with lock:
            manager.reload()            # see steps saved since startup
            latest = manager.latest_step()
            if latest is None or latest <= store["step"]:
                return None
            # the new step's config decides the state STRUCTURE (EMA
            # leaves, optimizer-schedule counters): precheck + rebuild
            # the abstract template from it, so training toggling
            # --ema-decay/--lr-schedule between saves surfaces a crafted
            # error (or just works) instead of a generic Orbax
            # structure-mismatch retried forever
            cfg_new = checkpoints.restore_config(manager, step=latest)
            if use_ema and cfg_new.train.ema_decay <= 0:
                raise ValueError(
                    f"step {latest} carries no EMA weights but the "
                    f"service was started with --ema; retrain with "
                    f"--ema-decay or restart the service without --ema")
            from musicvae_tpu.train import create_state
            tmpl_new = jax.eval_shape(lambda: create_state(cfg_new)[1])
            if jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                            tmpl_new.params) != param_shapes:
                raise ValueError(
                    f"step {latest} was trained with a different model "
                    f"structure than this service compiled for; restart "
                    f"the service on the new checkpoint")
            new_state, _ = checkpoints.restore(manager, tmpl_new,
                                               step=latest)  # strict
            new_params = (new_state.ema_params if use_ema
                          else new_state.params)
            store["params"] = jax.device_put(new_params,
                                             replicated(mesh))
            store["step"] = latest
            print(f"reloaded checkpoint step {latest}", file=sys.stderr)
            return latest

    return reload_once


def _start_reload_watcher(every: float, reload_once, stop) -> None:
    """``serve --reload-every SECS``: poll-mode reload — a daemon thread
    calls ``reload_once`` on a cadence; failures are logged and retried
    at the next poll (see _make_reload_once for the swap semantics)."""
    import threading

    def _watch():
        while not stop.wait(every):
            try:
                reload_once()
            except Exception as e:
                print(f"warning: checkpoint reload failed "
                      f"({type(e).__name__}: {e}); will retry",
                      file=sys.stderr)

    threading.Thread(target=_watch, daemon=True).start()


def _serve_socket(args, cfg, dispatch, to_host, store, request_kwargs,
                  banner: str, runner=None, request_arrays=None,
                  reload_once=None) -> int:
    """Multi-client transport for ``serve``: a threaded TCP server
    speaking the same line-delimited JSON protocol, one thread per
    connection, all multiplexed onto the ONE generation program compiled
    at startup.

    Concurrency model: a single device lock serializes dispatch+pull
    (the chip runs one sweep at a time anyway — single-tenant), but the
    host-side SMF encode + base64 of each response happens OUTSIDE the
    lock, so client A's encode overlaps client B's device sweep. That is
    the overlap the stdin ``--pipeline`` flag tried to buy, obtained
    here without tunnel contention (encode is pure host CPU, not a
    device→host pull racing the next dispatch). Per-client response
    order is the client's own request order (each connection is handled
    by one thread end-to-end); cross-client order is unspecified.

    ``--max-requests N`` stops the server after N requests (bounded
    soaks, tests); otherwise serve until interrupted. The actual bound
    port is announced on stderr (``--port 0`` picks a free one).

    With ``--coalesce W`` (``runner`` given) the device lock is replaced
    by a ``_Batcher``: handler threads submit their request arrays and
    block on a Future while one dispatcher thread answers up to W queued
    requests from a single device dispatch — the multi-client case is
    exactly where coalescing pays, since concurrent clients keep the
    batch queue full.
    """
    import base64
    import json
    import socketserver
    import threading
    import time

    import jax

    from musicvae_tpu.generate import bars_to_midi

    batcher = _Batcher(runner) if runner is not None else None
    device_lock = threading.Lock()
    state_lock = threading.Lock()
    counts = {"served": 0, "errors": 0, "requests": 0, "t0": None,
              "inflight": 0}
    # graceful-shutdown barrier: once set, handler threads stop picking
    # up new lines (already-ACCEPTED work finishes; buffered-but-unread
    # lines are refused by closing the connection — standard drain
    # semantics, the client sees EOF and can retry)
    draining = threading.Event()
    t_start = time.perf_counter()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for raw in self.rfile:
                if draining.is_set():
                    return
                # undecodable bytes fall through to json.loads, which
                # reports them in-band like any other malformed request
                line = raw.decode("utf-8", errors="replace").strip()
                if not line:
                    continue
                with state_lock:
                    counts["inflight"] += 1
                try:
                    rid = None
                    try:
                        req = json.loads(line)
                        rid = req.get("id")
                        _check_cmd(req)     # unknown cmd: in-band error, not
                        if req.get("cmd") in ("stats", "reload"):  # a sweep
                            if req["cmd"] == "stats":
                                with state_lock:
                                    resp = _stats_response(
                                        rid, cfg, store, counts["served"],
                                        counts["errors"], counts["requests"],
                                        t_start)
                            else:
                                resp = {"id": rid, "reloaded": reload_once(),
                                        "step": store["step"]}
                            try:
                                self.wfile.write(
                                    (json.dumps(resp) + "\n").encode())
                                self.wfile.flush()
                            except (BrokenPipeError, ConnectionResetError):
                                return
                            continue            # not a generation request
                        with state_lock:
                            default_seed = counts["requests"]
                            counts["requests"] += 1
                            if counts["t0"] is None:
                                counts["t0"] = time.perf_counter()
                        seed = int(req.get("seed", default_seed))
                        if batcher is not None:
                            arrays = request_arrays(req, seed)
                            t_req = time.perf_counter()
                            bars = batcher.submit(seed, arrays).result()
                        else:
                            kw = request_kwargs(req, seed)
                            t_req = time.perf_counter()
                            with device_lock:    # one in-flight sweep+pull
                                bars = to_host(
                                    dispatch(store["params"],
                                             jax.random.key(seed), **kw))
                        # encode outside the lock: overlaps other clients'
                        # device sweeps (see docstring)
                        resp = _gen_response(rid, bars, cfg, t_req)
                        with state_lock:
                            counts["served"] += 1
                    except Exception as e:       # in-band, per-request errors
                        resp = {"id": rid,
                                "error": f"{type(e).__name__}: {e}"}
                        with state_lock:
                            counts["errors"] += 1
                    write_failed = False
                    try:
                        self.wfile.write((json.dumps(resp) + "\n").encode())
                        self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        write_failed = True      # client went away mid-reply
                    # the shutdown check runs even when the reply could not
                    # be written: the request WAS served/counted, and a
                    # --max-requests service whose last client vanished
                    # mid-reply must still exit (the load harness bounds its
                    # wait on exactly this)
                    if args.max_requests:
                        with state_lock:
                            done = (counts["served"] + counts["errors"]
                                    >= args.max_requests)
                        if done:
                            threading.Thread(target=server.shutdown,
                                             daemon=True).start()
                            return
                    if write_failed:
                        return
                finally:
                    with state_lock:
                        counts["inflight"] -= 1

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    # SIGTERM/SIGINT → graceful shutdown: stop accepting, finish in-flight
    # requests (handler threads are daemons, so without the drain a
    # mid-sweep request would be killed with the process), then summarize.
    # A second signal escalates via the original handler (GracefulStop).
    from musicvae_tpu.train import GracefulStop
    closed = threading.Event()
    with Server((args.host, args.port), Handler) as server, \
            GracefulStop() as stop_sig:
        host, port = server.server_address[:2]
        print(f"{banner}; listening on {host}:{port}", file=sys.stderr)

        def _watch_signals():
            while not closed.is_set():
                if stop_sig.requested:
                    server.shutdown()
                    return
                time.sleep(0.1)

        threading.Thread(target=_watch_signals, daemon=True,
                         name="mvae-serve-sigwatch").start()
        try:
            server.serve_forever(poll_interval=0.1)
        except KeyboardInterrupt:
            pass
        finally:
            closed.set()
            if stop_sig.requested:
                draining.set()       # handlers stop picking up new lines
                # wait for inflight to stay 0 for a beat: a single zero
                # reading can be the instant between a finished request
                # and the handler picking up the next one
                deadline = time.time() + 30.0
                zero_since = None
                while time.time() < deadline:
                    with state_lock:
                        idle = counts["inflight"] == 0
                    if idle:
                        zero_since = zero_since or time.time()
                        if time.time() - zero_since > 0.3:
                            break
                    else:
                        zero_since = None
                    time.sleep(0.05)
                with state_lock:
                    left = counts["inflight"]
                if left:
                    print(f"shutdown signal: drain deadline expired with "
                          f"{left} request(s) still in flight",
                          file=sys.stderr)
                else:
                    print("shutdown signal: in-flight requests drained",
                          file=sys.stderr)
            if batcher is not None:
                batcher.stop()
    dt = (time.perf_counter() - counts["t0"]) \
        if counts["t0"] is not None else 0.0
    rate = f" ({counts['served'] / dt:.1f} req/s)" \
        if counts["served"] and dt > 0 else ""
    print(f"served {counts['served']} requests, {counts['errors']} errors "
          f"in {dt:.1f}s{rate}", file=sys.stderr)
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="musicvae_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("preprocess", help="MIDI → piano-roll window cache")
    _add_common(p)
    p.add_argument("--midi-glob", default=None,
                   help="glob of .mid files (default: synthetic corpus)")
    p.add_argument("--synthetic-pieces", type=int, default=64)
    p.add_argument("--labels", default=None,
                   help="JSON sidecar {basename: {'chord': c, 'key': k}} "
                        "overriding inferred labels for those files")
    p.add_argument("--no-infer-labels", action="store_true",
                   help="pin unlabeled real-MIDI chord/key to 0 instead of "
                        "inferring them from the rolls")
    p.add_argument("--out", default="data/rolls.npz")
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("train", help="train a config")
    _add_common(p)
    p.add_argument("--data", default=None, help="npz cache from preprocess")
    p.add_argument("--midi-glob", default=None,
                   help="train straight from .mid files (tensorized "
                        "in-process; labels from --labels else "
                        "inferred); --data takes precedence. Default "
                        "with neither: a synthetic corpus")
    p.add_argument("--labels", default=None,
                   help="with --midi-glob: JSON sidecar "
                        "{basename: {chord, key}} as in preprocess")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global batch size (config default; must divide "
                        "by the data-axis mesh size)")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--beta-schedule", choices=["linear", "cyclical"],
                   default=None, help="KL annealing mode (config default)")
    p.add_argument("--beta-cycle-steps", type=int, default=None,
                   help="cycle length for --beta-schedule cyclical")
    p.add_argument("--beta-warmup-steps", type=int, default=None)
    p.add_argument("--free-bits", type=float, default=None,
                   help="free-bits KL floor in nats per latent dimension "
                        "(posterior-collapse guard; 0 = plain KL-annealed "
                        "ELBO, the config default)")
    p.add_argument("--lr", type=float, default=None,
                   help="Adam learning rate (config default)")
    p.add_argument("--lr-schedule", choices=["constant", "cosine"],
                   default=None,
                   help="fixed lr (reference behavior) or warmup+cosine "
                        "decay to lr*lr_min_ratio at --steps")
    p.add_argument("--lr-warmup-steps", type=int, default=None,
                   help="linear lr warmup steps before the cosine decay")
    p.add_argument("--lr-min-ratio", type=float, default=None,
                   help="cosine floor as a fraction of --lr (default 0)")
    p.add_argument("--grad-clip", type=float, default=None,
                   help="global-norm gradient clipping "
                        "(TrainSpec.grad_clip_norm; 0 = off)")
    p.add_argument("--enc-channels", default=None,
                   help="comma-separated ModelSpec.enc_channels override "
                        "(capacity sweeps; stored in the checkpoint)")
    p.add_argument("--dec-channels", default=None,
                   help="comma-separated ModelSpec.dec_channels override")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="maintain exponential-moving-average weights with "
                        "this decay (e.g. 0.999; 0 = off, the config "
                        "default). Checkpointed; sample them with "
                        "generate/eval-gen --ema")
    p.add_argument("--eval-every", type=int, default=None,
                   help="run held-out eval every N steps (0 = off); the "
                        "best state by eval loss is kept in "
                        "<ckpt-dir>/best")
    p.add_argument("--eval-batches", type=int, default=None)
    p.add_argument("--log-every", type=int, default=None,
                   help="metrics log cadence in steps, 0 = off (config "
                        "default; also bounds the K-step dispatch size "
                        "via the log/ckpt/eval cadence gcd)")
    p.add_argument("--ckpt-every", type=int, default=None,
                   help="periodic checkpoint cadence in steps, 0 = off "
                        "(the final and preemption saves still happen; "
                        "config default)")
    p.add_argument("--transpose-aug", type=int, default=None,
                   help="on-device pitch-transpose augmentation: uniform "
                        "per-example shift in [-K, +K] semitones per "
                        "step; cond models rotate chord/key labels with "
                        "the shift (0 = off)")
    p.add_argument("--corpus-layout", choices=["replicated", "sharded"],
                   default=None,
                   help="resident bar-cache layout: replicate into every "
                        "device's HBM (default) or shard piece-wise over "
                        "the 'data' mesh axis (1/D HBM per device; local "
                        "shard_map gathers — train/sharded_corpus.py)")
    p.add_argument("--stream", action="store_true",
                   help="stream host batches instead of the device-"
                        "resident cache (corpora larger than HBM; "
                        "bit-packed double-buffered producer)")
    p.add_argument("--host-sharded", action="store_true",
                   help="multi-host: each process loads only its "
                        "PianoRollDataset.host_shard of the corpus and "
                        "streams its rows of the global batch (implies "
                        "--stream; no in-training eval)")
    p.add_argument("--holdout-frac", type=float, default=None,
                   help="fraction of pieces held out for eval "
                        "(config default 0.1)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="reconstruction metrics on a dataset")
    _add_common(p)
    p.add_argument("--data", default=None, help="npz cache from preprocess")
    p.add_argument("--midi-glob", default=None,
                   help="score raw .mid files directly (alternative to "
                        "--data)")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--ema", action="store_true",
                   help="score the checkpoint's EMA weights (requires "
                        "training with --ema-decay)")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("eval-gen",
                       help="sample-quality statistics of generations, "
                            "optionally vs a reference corpus "
                            "(JS divergences of pitch/pitch-class "
                            "histograms, density/duration/polyphony stats)")
    _add_common(p)
    p.add_argument("--data", default=None,
                   help="npz cache from preprocess — the reference corpus "
                        "the generations are compared against")
    p.add_argument("--midi-glob", default=None,
                   help="compare against .mid files directly (tensorized "
                        "in-process); --data takes precedence")
    p.add_argument("--bars", type=int, default=16)
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--interpolate", action="store_true")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--sample-mode", choices=["threshold", "bernoulli"],
                   default="threshold")
    p.add_argument("--sample-temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true",
                   help="score the checkpoint's EMA weights "
                        "(requires training with --ema-decay)")
    p.set_defaults(fn=cmd_eval_gen)

    p = sub.add_parser("generate", help="bar-by-bar autoregressive sampling")
    _add_common(p)
    p.add_argument("--bars", type=int, default=16)
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--interpolate", action="store_true")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="latent-space z scale")
    p.add_argument("--sample-mode", choices=["threshold", "bernoulli"],
                   default="threshold",
                   help="bar output: deterministic binarize (reference "
                        "behavior) or stochastic per-cell Bernoulli")
    p.add_argument("--sample-temperature", type=float, default=1.0,
                   help="Bernoulli mode: sigmoid(logits/T) sharpening")
    p.add_argument("--chord", type=int, default=None,
                   help="conditional models: chord class 0..23 "
                        "(root*2 + minor), default random per sample")
    p.add_argument("--key", type=int, default=None,
                   help="conditional models: key class 0..23, "
                        "default random per sample")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true",
                   help="sample from the checkpoint's EMA weights "
                        "(requires training with --ema-decay)")
    p.add_argument("--seed-midi", default=None,
                   help="continue from real music: the file's last bar "
                        "seeds the prev-bar conditioning (SURVEY §3.3 "
                        "'zeros or a real bar')")
    p.add_argument("--encode", action="store_true",
                   help="with --seed-midi: also start the latent path "
                        "from the encoded posterior of the file's last "
                        "window instead of the prior")
    p.add_argument("--interp-midi-b", default=None,
                   help="morph between two real pieces: with --seed-midi A "
                        "--encode --interpolate, the sweep slerps from A's "
                        "encoded latent to THIS file's (the MusicVAE "
                        "two-endpoint interpolation)")
    p.add_argument("--out-dir", default="generated")
    p.add_argument("--write-midis", type=int, default=8)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("reconstruct",
                       help="MIDI in -> encode -> decode -> MIDI out "
                            "(eval-time reconstruction + P/R/F1)")
    _add_common(p)
    p.add_argument("--midi-glob", required=True,
                   help="glob of .mid files to reconstruct")
    p.add_argument("--out-dir", default="reconstructed")
    p.add_argument("--seed", type=int, default=0,
                   help="posterior-sample PRNG seed")
    p.add_argument("--ema", action="store_true",
                   help="reconstruct with the checkpoint's EMA weights "
                        "(requires training with --ema-decay)")
    p.set_defaults(fn=cmd_reconstruct)

    p = sub.add_parser("describe",
                       help="inspect a checkpoint dir (config, steps, "
                            "best metric, param count) — read-only, "
                            "never touches a device")
    _add_common(p)
    p.set_defaults(fn=cmd_describe)

    p = sub.add_parser("convert",
                       help="torch state-dict <-> Orbax checkpoint")
    _add_common(p)
    p.add_argument("--from-torch", default=None, metavar="PT",
                   help="torch .pt state_dict (or {'model': ...} bundle) "
                        "to import; writes an Orbax checkpoint to --out")
    p.add_argument("--to-torch", default=None, metavar="CKPT_DIR",
                   help="Orbax checkpoint dir to export; writes a torch "
                        "state_dict to --out")
    p.add_argument("--from-safetensors", default=None, metavar="ST",
                   help="safetensors file to import (same canonical "
                        "tensor names as the torch export); writes an "
                        "Orbax checkpoint to --out")
    p.add_argument("--to-safetensors", default=None, metavar="CKPT_DIR",
                   help="Orbax checkpoint dir to export as a safetensors "
                        "file at --out (config/step in the metadata)")
    p.add_argument("--out", required=True,
                   help="destination (ckpt dir for --from-*, file path "
                        "for --to-*)")
    p.add_argument("--ema", action="store_true",
                   help="--to-*: export the checkpoint's EMA weights "
                        "instead of the raw params (requires training "
                        "with --ema-decay)")
    p.add_argument("--step", type=int, default=0,
                   help="--from-torch: step number for the written "
                        "checkpoint")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("serve", help="persistent generation service "
                                     "(JSON lines on stdin/stdout)")
    _add_common(p)
    p.add_argument("--bars", type=int, default=16)
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--interpolate", action="store_true")
    p.add_argument("--sample-mode", choices=["threshold", "bernoulli"],
                   default="threshold")
    p.add_argument("--sample-temperature", type=float, default=1.0)
    p.add_argument("--warm-seed", action="store_true",
                   help="also pre-compile the seeded-request "
                        "(seed_midi_b64) program at startup so no request "
                        "ever waits on a compile")
    p.add_argument("--ema", action="store_true",
                   help="serve the checkpoint's EMA weights (requires "
                        "training with --ema-decay; hot reloads keep "
                        "pulling the EMA side)")
    p.add_argument("--pipeline", action="store_true",
                   help="stdin mode: overlap device compute with host "
                        "MIDI encoding under load (measured slightly "
                        "slower over the axon tunnel — see cmd_serve "
                        "docstring; useful where device->host DMA is "
                        "truly concurrent)")
    p.add_argument("--coalesce", type=int, default=1,
                   help="dynamic batching width W: up to W queued "
                        "requests run as ONE device dispatch, amortizing "
                        "the per-dispatch floor (~25 ms on remote-TPU "
                        "links) W-ways. One uniform trace serves every "
                        "request mix (plain/seeded/conditioned) — no "
                        "--warm-seed needed. 1 = off (per-request "
                        "dispatch)")
    p.add_argument("--port", type=int, default=None,
                   help="serve the same JSON-line protocol over TCP "
                        "instead of stdin: threaded multi-client server "
                        "on one compiled program (0 = pick a free port, "
                        "announced on stderr)")
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address for --port (default loopback)")
    p.add_argument("--max-requests", type=int, default=0,
                   help="with --port: stop after N requests (bounded "
                        "soaks/tests; 0 = serve until interrupted)")
    p.add_argument("--reload-every", type=float, default=0.0,
                   help="poll the checkpoint dir every SECS seconds and "
                        "hot-swap newer params into the running service "
                        "(no retrace — shapes are fixed by the "
                        "checkpoint's config). The train->serve loop "
                        "without a restart. 0 = off")
    p.set_defaults(fn=cmd_serve)

    args = parser.parse_args(argv)
    if args.cmd == "describe" and not os.environ.get("JAX_PLATFORMS"):
        # inspect-only subcommand: pin the CPU backend before anything
        # touches jax, so a read-only `describe` never connects to (or
        # hangs on) the TPU. Done HERE — the CLI process boundary — not
        # inside cmd_describe, so in-process callers keep their backend.
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass    # backend already initialized by an embedding caller
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        # honor the standard env var even where an ambient sitecustomize
        # (e.g. the axon TPU tunnel's) pre-imports jax and pins the
        # platform at import time — without this, JAX_PLATFORMS=cpu
        # subprocess runs silently land on the TPU anyway
        import jax
        try:
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass
    _enable_compile_cache()
    if args.cmd in ("train", "eval", "generate", "serve"):
        # backend-using subcommands only: preprocess is host-side and must
        # not block on a multi-host coordinator barrier
        from musicvae_tpu.parallel import initialize_from_env
        initialize_from_env()
    try:
        return args.fn(args)
    except KeyError as e:
        # unknown --config etc.: clean one-liner instead of a traceback
        print(f"error: {e.args[0] if e.args else e}", file=sys.stderr)
        return 2
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    except ValueError as e:
        # ONLY the two user-input error classes get the clean one-liner:
        # SMFError (malformed/unsupported MIDI data) and _UsageError
        # (flag validation past argparse, e.g. --meter 5/4). Any other
        # ValueError is an internal bug and must keep its traceback.
        from musicvae_tpu.midi.smf import SMFError
        if isinstance(e, SMFError):
            print(f"error: malformed MIDI: {e}", file=sys.stderr)
            return 2
        if isinstance(e, _UsageError):
            print(f"error: {e}", file=sys.stderr)
            return 2
        raise


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (big win on remote-compile TPU
    setups, where identical programs can take minutes to recompile)."""
    import jax
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/musicvae_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jaxlibs without the option


if __name__ == "__main__":
    sys.exit(main())
