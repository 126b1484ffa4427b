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
               "dec_channels": tuple(d["model"]["dec_channels"])}),
        train=config_lib.TrainSpec(**d["train"]),
        gen=config_lib.GenSpec(**d["gen"]),
        mesh=config_lib.MeshSpec(**d["mesh"]),
    )


def make_manager(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, enable_async_checkpointing=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save(manager: ocp.CheckpointManager, state, cfg: config_lib.Config,
         wait: bool = False) -> None:
    step = int(jax.device_get(state.step))
    manager.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            config=ocp.args.JsonSave(dataclasses.asdict(cfg)),
        ))
    if wait:
        manager.wait_until_finished()


def restore_config(manager: ocp.CheckpointManager,
                   step: Optional[int] = None) -> config_lib.Config:
    """Read only the Config stored in a checkpoint (cheap: JSON item)."""
    step = step if step is not None else manager.latest_step()
    if step is None:
        raise FileNotFoundError("no checkpoint found")
    restored = manager.restore(
        step, args=ocp.args.Composite(config=ocp.args.JsonRestore()))
    return config_from_json(json.dumps(restored["config"]))


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
    last_err: Optional[Exception] = None
    for s in steps:
        try:
            restored = manager.restore(
                s,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(abstract_state),
                    config=ocp.args.JsonRestore(),
                ))
        except Exception as e:
            if strict:
                raise
            last_err = e
            import sys
            print(f"warning: checkpoint step {s} failed to restore "
                  f"({type(e).__name__}); falling back to an earlier step",
                  file=sys.stderr)
            # deregister the damaged step: Orbax refuses to save at a step
            # <= latest_step, so leaving it registered would silently DROP
            # every future save up to s — the resumed run would re-train
            # and persist nothing
            try:
                manager.delete(s)
            except Exception as de:
                print(f"warning: could not delete corrupt step {s} "
                      f"({type(de).__name__}); saves at steps <= {s} may "
                      f"be skipped", file=sys.stderr)
            continue
        cfg = config_from_json(json.dumps(restored["config"]))
        return restored["state"], cfg
    raise RuntimeError(
        f"all checkpoint steps {steps} failed to restore") from last_err
