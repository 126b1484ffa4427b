"""BASELINE parity bar: bit-identical piano-roll tensors, JAX vs torch oracle.

The reference tree was unreadable (SURVEY §0.1); per §0.2 the torch-CPU
oracle implementing SEMANTICS.md stands in for it. Property-style sweep over
randomized note soups plus adversarial cases.
"""

import numpy as np
import pytest
import torch

from musicvae_tpu.config import MidiSpec
from musicvae_tpu.midi import smf, tensorize
from tests.oracle.oracle_tensorize import oracle_bars, oracle_crop

SPEC = MidiSpec()


def _random_midi(seed: int, tpq: int, n_notes: int) -> smf.MidiFile:
    rng = np.random.default_rng(seed)
    notes = []
    for _ in range(n_notes):
        start = int(rng.integers(0, 8 * 4 * tpq))
        length = int(rng.integers(0, 2 * tpq))
        pitch = int(rng.integers(0, 128))
        notes.append(smf.Note(pitch, start, start + max(length, 1), 100))
    notes.sort(key=lambda n: (n.start_tick, n.pitch, n.end_tick))
    return smf.MidiFile(ticks_per_quarter=tpq, notes=tuple(notes))


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("tpq", [96, 220, 480, 960])  # incl. non-multiples
def test_random_note_soup_bit_identical(seed, tpq):
    midi = _random_midi(seed, tpq, n_notes=200)
    events, total = tensorize.notes_to_events(midi, SPEC, max_events=256)
    jax_bars = np.asarray(tensorize.events_to_roll(events, total))
    jax_bars = jax_bars.reshape(-1, SPEC.steps_per_bar, 128)
    torch_bars = oracle_bars(midi, SPEC).numpy()
    np.testing.assert_array_equal(jax_bars, torch_bars)


def test_through_smf_bytes_bit_identical():
    midi = _random_midi(123, 480, 300)
    data = smf.write_smf(list(midi.notes), 480)
    jax_bars = np.asarray(tensorize.midi_bytes_to_bars(data, SPEC))
    torch_bars = oracle_bars(smf.parse_smf(data), SPEC).numpy()
    np.testing.assert_array_equal(jax_bars, torch_bars)


def test_crop_parity():
    spec = MidiSpec(pitch_lo=36, pitch_hi=96)
    midi = _random_midi(7, 480, 100)
    events, total = tensorize.notes_to_events(midi, spec, 128)
    jax_bars = tensorize.chunk_bars(
        tensorize.events_to_roll(events, total), spec.steps_per_bar)
    t = oracle_crop(oracle_bars(midi, spec), spec).numpy()
    np.testing.assert_array_equal(
        np.asarray(tensorize.crop_view(jax_bars, spec)), t)


@pytest.mark.parametrize("seed", range(4))
def test_numpy_rasterizer_matches_jax(seed):
    """Host (numpy) corpus rasterizer ≡ on-device (jax) rasterizer."""
    midi = _random_midi(seed, 480, 150)
    events, total = tensorize.notes_to_events(midi, SPEC, 256)
    np.testing.assert_array_equal(
        tensorize.events_to_roll_np(events, total),
        np.asarray(tensorize.events_to_roll(events, total)))


def test_corpus_to_bars_matches_per_piece():
    from musicvae_tpu.data.synthetic import synth_corpus
    pieces = [p[0] for p in synth_corpus(4, n_bars=8, seed=3)]
    batched = tensorize.corpus_to_bars(pieces, SPEC)
    for data, bars in zip(pieces, batched):
        np.testing.assert_array_equal(
            bars, np.asarray(tensorize.midi_bytes_to_bars(data, SPEC)))


def test_quantization_boundary_ticks_identical():
    """Half-step boundary ticks: rounding must agree exactly (§2)."""
    from tests.oracle.oracle_tensorize import oracle_quantize
    for tpq in (96, 220, 333, 480, 960):
        ticks = np.arange(0, 6 * tpq, dtype=np.int64)
        q_jax = tensorize.quantize_ticks(ticks, tpq, 24)
        q_torch = np.array([oracle_quantize(int(t), tpq, 24) for t in ticks])
        np.testing.assert_array_equal(q_jax, q_torch)
