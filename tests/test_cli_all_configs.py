"""Every registered config runs preprocess → train → describe → generate
through the CLI (VERDICT r4 #3: first-class e2e coverage for the whole
model family — no config may exist without an end-to-end test).

Full-width models with tiny global batches (--batch-size 4) on the CPU
test backend: the point is that each registered architecture compiles,
trains, checkpoints, round-trips its config, and generates — not speed.
"""

import numpy as np
import pytest

from musicvae_tpu.cli import main
from musicvae_tpu.config import all_config_names, get_config


@pytest.mark.parametrize("name", all_config_names())
def test_config_e2e_train_generate_describe(name, tmp_path, capsys):
    cfg = get_config(name)
    # meshed configs (C4/C5 declare data=8) need a batch divisible over
    # the fake 8-device data axis; single-device configs train batch 4
    batch = max(4, cfg.mesh.data)
    samples = max(2, cfg.mesh.data)
    data = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", name,
                 "--synthetic-pieces", "4", "--out", data]) == 0
    assert main(["train", "--config", name, "--data", data,
                 "--steps", "2", "--batch-size", str(batch),
                 "--eval-every", "0", "--holdout-frac", "0",
                 "--log-every", "1",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()

    # describe reports the embedded config faithfully — including the
    # round-4/5 architecture axes (stem, temporal) that distinguish the
    # MXU and attention families from the parity ones
    assert main(["describe", "--ckpt-dir", str(tmp_path / "c")]) == 0
    out = capsys.readouterr().out
    assert f'"{name}"' in out
    assert f'"{cfg.model.stem}"' in out
    assert f'"{cfg.model.temporal}"' in out

    gen_dir = str(tmp_path / "g")
    assert main(["generate", "--config", name,
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--bars", "4", "--samples", str(samples),
                 "--write-midis", "1", "--out-dir", gen_dir]) == 0
    rolls = np.load(gen_dir + "/rolls.npy")
    assert rolls.shape == (samples, 4, cfg.midi.steps_per_bar,
                           cfg.midi.num_pitches)
    assert set(np.unique(rolls)) <= {0, 1}
