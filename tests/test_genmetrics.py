"""Generation-quality statistics (utils/genmetrics.py) + eval-gen CLI."""

import json

import numpy as np
import pytest

from musicvae_tpu.utils.genmetrics import (SCALAR_KEYS, bar_stats,
                                           compare_stats, js_divergence,
                                           to_jsonable)


def _two_bars():
    """bar0: pitch 3 held steps 0-3 + pitch 5 held steps 2-3; bar1 empty."""
    bars = np.zeros((2, 8, 12), np.uint8)
    bars[0, 0:4, 3] = 1
    bars[0, 2:4, 5] = 1
    return bars


def test_bar_stats_hand_checked_values():
    s = bar_stats(_two_bars())
    assert s["frac_empty_bars"] == 0.5
    assert s["notes_per_bar"] == 1.0            # 2 onsets / 2 bars
    assert s["active_cells_per_bar"] == 3.0     # 6 cells / 2 bars
    assert s["mean_note_len"] == 3.0            # 6 cells / 2 onsets
    # live steps: 0,1 -> 1 pitch; 2,3 -> 2 pitches
    assert s["polyphony"] == 1.5
    np.testing.assert_allclose(s["mean_pitch"], (4 * 3 + 2 * 5) / 6)
    assert s["pitch_range"] == 2.0              # 5 - 3 over the nonempty bar
    np.testing.assert_allclose(s["pitch_hist"][3], 4 / 6)
    np.testing.assert_allclose(s["pitch_hist"][5], 2 / 6)
    assert s["pitch_hist"].sum() == pytest.approx(1.0)
    # P == 12: pitch-class histogram is the pitch histogram itself
    np.testing.assert_allclose(s["pitch_class_hist"], s["pitch_hist"])


def test_bar_stats_flattens_leading_axes():
    bars = _two_bars()
    s2 = bar_stats(bars)
    s4 = bar_stats(bars.reshape(1, 2, 8, 12))
    for k in SCALAR_KEYS:
        assert s2[k] == s4[k]


def test_bar_stats_truncates_notes_at_barlines():
    """A note held across the barline is two bar-level onsets (module-doc
    semantics — the same convention for generated sweeps and datasets)."""
    bars = np.zeros((2, 4, 12), np.uint8)
    bars[:, :, 7] = 1                      # pitch 7 held through both bars
    s = bar_stats(bars)
    assert s["notes_per_bar"] == 1.0       # one onset in EACH bar
    assert s["mean_note_len"] == 4.0


def test_bar_stats_all_empty_and_bad_shapes():
    s = bar_stats(np.zeros((3, 4, 12), np.uint8))
    assert s["frac_empty_bars"] == 1.0
    assert s["mean_note_len"] == 0.0 and s["polyphony"] == 0.0
    assert s["pitch_hist"].sum() == 0.0
    with pytest.raises(ValueError):
        bar_stats(np.zeros((4, 12)))
    with pytest.raises(ValueError):
        bar_stats(np.zeros((0, 4, 12)))


def test_bar_stats_pads_pitch_axis_to_pitch_classes():
    bars = np.zeros((1, 4, 128), np.uint8)   # 128 % 12 != 0
    bars[0, 0, 60] = 1                       # middle C -> pc 0
    s = bar_stats(bars)
    assert s["pitch_class_hist"].shape == (12,)
    np.testing.assert_allclose(s["pitch_class_hist"][0], 1.0)


def test_js_divergence_properties():
    p = np.array([4.0, 0.0, 2.0])            # raw counts are fine
    q = np.array([2.0, 1.0, 1.0])
    assert js_divergence(p, p) == 0.0
    assert js_divergence(p, q) == pytest.approx(js_divergence(q, p))
    assert 0.0 < js_divergence(p, q) < np.log(2.0)
    # disjoint support -> exactly ln 2
    assert js_divergence([1, 0], [0, 1]) == pytest.approx(np.log(2.0))
    # all-zero pairs: equal -> 0, one-sided -> ln 2 (maximally different)
    assert js_divergence([0, 0], [0, 0]) == 0.0
    assert js_divergence([0, 0], [1, 0]) == pytest.approx(np.log(2.0))
    with pytest.raises(ValueError):
        js_divergence([1, 2], [1, 2, 3])


def test_compare_stats_and_jsonable():
    g, r = bar_stats(_two_bars()), bar_stats(_two_bars())
    c = compare_stats(g, r)
    assert c["js_pitch"] == 0.0 and c["js_pitch_class"] == 0.0
    for k in SCALAR_KEYS:
        assert c[f"abs_diff_{k}"] == 0.0 and c[f"rel_diff_{k}"] == 0.0
    # identical histograms, shifted scalars
    r2 = dict(r, notes_per_bar=2.0)
    c2 = compare_stats(g, r2)
    assert c2["abs_diff_notes_per_bar"] == 1.0
    assert c2["rel_diff_notes_per_bar"] == pytest.approx(0.5)
    # relative diff vs a zero reference is undefined -> None (JSON null)
    r3 = dict(r, notes_per_bar=0.0)
    c3 = compare_stats(g, r3)
    assert c3["rel_diff_notes_per_bar"] is None
    assert c3["abs_diff_notes_per_bar"] == 1.0
    assert json.loads(json.dumps(to_jsonable(c3)))[
        "rel_diff_notes_per_bar"] is None
    json.dumps(to_jsonable(g))               # round-trips through json


def test_cli_eval_gen_smoke(tmp_path, capsys):
    from musicvae_tpu.cli import main

    out = str(tmp_path / "rolls.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    rc = main(["eval-gen", "--config", "c1_conv_bar", "--data", out,
               "--samples", "2", "--bars", "2", "--seed", "1",
               "--ckpt-dir", str(tmp_path / "none")])
    assert rc == 0
    cap = capsys.readouterr()
    assert "no checkpoint" in cap.err         # random-init warning path
    result = json.loads(cap.out.strip().splitlines()[-1])
    assert result["samples"] == 2 and result["bars_per_sample"] == 2
    for section in ("gen", "ref", "compare"):
        assert section in result
    assert 0.0 <= result["compare"]["js_pitch_class"] <= np.log(2.0) + 1e-9
    assert set(SCALAR_KEYS) <= set(result["gen"])


def test_cli_eval_gen_midi_glob_reference(tmp_path, capsys):
    """eval-gen can take the reference corpus as raw .mid files."""
    from musicvae_tpu.cli import main
    from musicvae_tpu.data import synth_corpus

    for i, (midi, _, _) in enumerate(synth_corpus(2, n_bars=6, seed=4)):
        (tmp_path / f"p{i}.mid").write_bytes(midi)
    rc = main(["eval-gen", "--config", "c1_conv_bar",
               "--midi-glob", str(tmp_path / "*.mid"),
               "--samples", "2", "--bars", "2",
               "--ckpt-dir", str(tmp_path / "none")])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "ref" in result and "compare" in result
    assert result["ref"]["active_cells_per_bar"] > 0
