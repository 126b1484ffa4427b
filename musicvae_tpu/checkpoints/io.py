"""Orbax checkpointing (SURVEY §3.5, §5.4).

Reference: ``torch.save({'model':…, 'opt':…, 'step':…})`` / ``load_state_dict``
with resume. Rebuild: an Orbax CheckpointManager over the full TrainState
pytree {params, opt_state, step, rng} plus the Config (JSON), async save,
keep-N retention — every run is step-resumable (SURVEY §5.3).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from musicvae_tpu import config as config_lib


def config_to_json(cfg: config_lib.Config) -> str:
    return json.dumps(dataclasses.asdict(cfg))


def config_from_json(text: str) -> config_lib.Config:
    d = json.loads(text)
    return config_lib.Config(
        name=d["name"],
        midi=config_lib.MidiSpec(**d["midi"]),
        model=config_lib.ModelSpec(
            **{**d["model"],
               "enc_channels": tuple(d["model"]["enc_channels"]),
               "dec_channels": tuple(d["model"]["dec_channels"]),
               # absent in pre-round-4 checkpoints: default the MXU-stem
               # fields so old checkpoints keep restoring
               "stem": d["model"].get("stem", "conv"),
               "patch_size": tuple(d["model"].get("patch_size", (8, 16)))}),
        train=config_lib.TrainSpec(**d["train"]),
        gen=config_lib.GenSpec(**d["gen"]),
        mesh=config_lib.MeshSpec(**d["mesh"]),
    )


def make_manager(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, enable_async_checkpointing=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def _state_to_tree(state):
    """TrainState (or a ShapeDtypeStruct template of one) → the plain
    key dict Orbax stores. The OPTIONAL ema_params entry appears only
    when EMA is enabled, so EMA-off states keep the exact pre-EMA
    4-key on-disk structure — checkpoints written before the field
    existed restore unchanged, and EMA-off checkpoints written now
    restore under the old code. (Saving the dataclass directly would
    record the None field in the tree metadata and break both
    directions.) Non-TrainState pytrees pass through untouched."""
    if not hasattr(state, "params"):
        return state
    d = {"params": state.params, "opt_state": state.opt_state,
         "step": state.step, "rng": state.rng}
    if getattr(state, "ema_params", None) is not None:
        d["ema_params"] = state.ema_params
    return d


def _tree_to_state(template, tree):
    """Inverse of _state_to_tree for a TrainState-like template; plain
    pytrees pass through."""
    if not hasattr(template, "params"):
        return tree
    return template.replace(params=tree["params"],
                            opt_state=tree["opt_state"],
                            step=tree["step"], rng=tree["rng"],
                            ema_params=tree.get("ema_params"))


def save(manager: ocp.CheckpointManager, state, cfg: config_lib.Config,
         wait: bool = False) -> bool:
    """Save; returns whether Orbax actually wrote the step. False means
    the manager's should_save declined (the directory already holds this
    step or a NEWER one) — callers that promise the user a checkpoint
    exists at state.step must check this (the CLI refuses to start a
    fresh run into a dir with existing checkpoints for exactly this
    reason)."""
    step = int(jax.device_get(state.step))
    saved = manager.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(_state_to_tree(state)),
            config=ocp.args.JsonSave(dataclasses.asdict(cfg)),
        ))
    if wait:
        manager.wait_until_finished()
    return bool(saved)


def restore_config(manager: ocp.CheckpointManager,
                   step: Optional[int] = None) -> config_lib.Config:
    """Read only the Config stored in a checkpoint (cheap: JSON item).

    Like restore(), an unspecified ``step`` skips damaged steps
    (newest-first) instead of dying on a corrupt latest — eval/generate/
    serve must survive the same interrupted-save damage resume survives.
    An explicit ``step`` is strict.
    """
    if step is not None:
        steps = [step]
    else:
        steps = sorted(manager.all_steps(), reverse=True)
    if not steps:
        raise FileNotFoundError("no checkpoint found")
    last_err: Optional[Exception] = None
    for s in steps:
        try:
            restored = manager.restore(
                s, args=ocp.args.Composite(config=ocp.args.JsonRestore()))
        except Exception as e:
            if step is not None:
                raise
            last_err = e
            continue
        return config_from_json(json.dumps(restored["config"]))
    raise RuntimeError(
        f"no checkpoint step has a readable config "
        f"({steps})") from last_err


def restore(manager: ocp.CheckpointManager, abstract_state,
            step: Optional[int] = None) -> Tuple[Any, config_lib.Config]:
    """Restore (state, config). abstract_state: a pytree of ShapeDtypeStructs
    or a concrete template TrainState (e.g. from trainer.create_state).

    With no explicit ``step``, a step that fails to load (e.g. corrupted
    on disk after an interrupted write that still committed its marker)
    is skipped with a warning and the next-newest complete step is tried —
    resume survives a damaged latest checkpoint (SURVEY §5.3 failure
    detection). An explicit ``step`` is strict: failures propagate.
    """
    if step is not None:
        steps = [step]
        strict = True
    else:
        steps = sorted(manager.all_steps(), reverse=True)
        strict = False
    if not steps:
        raise FileNotFoundError("no checkpoint found")
    abstract_tree = _state_to_tree(abstract_state)

    def _restore_step(s):
        try:
            return manager.restore(
                s,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(abstract_tree),
                    config=ocp.args.JsonRestore(),
                ))
        except ValueError as e:
            # interim-layout compatibility: EMA-off checkpoints written
            # by the first EMA build saved the dataclass directly, which
            # recorded an explicit None ema_params node in the tree
            # metadata; retry with that node present so those steps stay
            # restorable alongside pre-EMA (4-key) and current layouts
            if (isinstance(abstract_tree, dict)
                    and "ema_params" not in abstract_tree
                    and "ema_params" in str(e)):
                return manager.restore(
                    s,
                    args=ocp.args.Composite(
                        state=ocp.args.StandardRestore(
                            {**abstract_tree, "ema_params": None}),
                        config=ocp.args.JsonRestore(),
                    ))
            raise

    last_err: Optional[Exception] = None
    failed: list = []
    for s in steps:
        restored = None
        # two attempts per step: a transient failure (network/FS hiccup,
        # host OOM during that one restore) is indistinguishable from real
        # corruption on a single try, and falling back on a transient
        # would sideline a healthy latest checkpoint
        for attempt in range(2):
            try:
                restored = _restore_step(s)
                break
            except Exception as e:
                if strict:
                    raise
                last_err = e
                import sys
                print(f"warning: checkpoint step {s} failed to restore "
                      f"({type(e).__name__}); "
                      f"{'retrying once' if attempt == 0 else 'falling back to an earlier step'}",
                      file=sys.stderr)
        if restored is None:
            failed.append(s)
            continue
        cfg = config_from_json(json.dumps(restored["config"]))
        # Deregister the failed newer steps — but ONLY now that a restore
        # with the SAME template succeeded, which proves those steps are
        # genuinely damaged rather than the caller's template being wrong
        # (a wrong template fails for every step; acting on each failure
        # would cascade into sidelining all checkpoints on a user mistake).
        # Without deregistration, Orbax refuses saves at steps <=
        # latest_step, so the resumed run would re-train the lost steps and
        # silently persist nothing. The step is QUARANTINED (renamed to
        # '<step>.corrupt'), not deleted: if the double failure was still
        # environmental, the data remains recoverable by hand.
        for fs in failed:
            _quarantine_step(manager, fs)
        if failed:
            try:
                manager.reload()   # drop the renamed steps from the
            except Exception as e:  # manager's in-memory step list
                import sys
                print(f"warning: could not refresh the checkpoint "
                      f"manager's step list after quarantining "
                      f"{failed} ({type(e).__name__}: {e}); saves at "
                      f"steps <= {max(failed)} may be refused until "
                      f"the manager is recreated", file=sys.stderr)
        return _tree_to_state(abstract_state, restored["state"]), cfg
    raise RuntimeError(
        f"all checkpoint steps {steps} failed to restore "
        f"(nothing was deleted or quarantined — if this is a config/"
        f"template mismatch, retry with the checkpoint's own config)"
        ) from last_err


def _quarantine_step(manager: ocp.CheckpointManager, step: int) -> None:
    """Move a proven-corrupt step directory aside as '<step>.corrupt[.N]'
    so Orbax no longer lists it (its name no longer parses as a step) but
    the payload stays on disk for manual recovery."""
    import sys
    try:
        src = os.path.join(str(manager.directory), str(step))
        dst = f"{src}.corrupt"
        n = 0
        while os.path.exists(dst):
            n += 1
            dst = f"{src}.corrupt.{n}"
        os.rename(src, dst)
        print(f"warning: quarantined corrupt checkpoint step {step} as "
              f"{os.path.basename(dst)} (recoverable by hand; delete it to "
              f"reclaim space)", file=sys.stderr)
    except Exception as de:
        print(f"warning: could not quarantine corrupt step {step} "
              f"({type(de).__name__}); saves at steps <= {step} may be "
              f"skipped", file=sys.stderr)
