"""Torch-CPU oracle for the MIDI tensorization path (SURVEY §0.2/§4.1).

Implements midi/SEMANTICS.md §§2–5 with torch ops, independently of the JAX
implementation, mirroring the reference's pretty_midi→quantize→chunk→crop
pipeline semantics (BASELINE.json). tests/test_tensorize_parity.py asserts
bit-identical rolls between this and musicvae_tpu.midi.tensorize — the
BASELINE "bit-identical piano-roll tensors" parity bar, stood in for the
unreadable reference (SURVEY §0.1).

Deliberately written in a torch idiom (per-note Python loop writing slices,
the way a small PyTorch research repo rasterizes) rather than the JAX
delta/cumsum trick, so the two implementations are genuinely independent.
"""

from __future__ import annotations

import torch

from musicvae_tpu.config import MidiSpec
from musicvae_tpu.midi.smf import MidiFile


def oracle_quantize(tick: int, tpq: int, spq: int) -> int:
    """SEMANTICS.md §2, exact integer round-half-up."""
    return (2 * tick * spq + tpq) // (2 * tpq)


def oracle_bars(midi: MidiFile, spec: MidiSpec) -> torch.Tensor:
    """MidiFile → bars[n, steps_per_bar, 128] float32, per SEMANTICS §2–4."""
    spq = spec.steps_per_quarter
    spb = spec.steps_per_bar
    tpq = midi.ticks_per_quarter

    intervals = []
    max_off = 0
    for n in midi.notes:
        s_on = oracle_quantize(n.start_tick, tpq, spq)
        s_off = max(oracle_quantize(n.end_tick, tpq, spq), s_on + 1)
        intervals.append((s_on, s_off, n.pitch))
        max_off = max(max_off, s_off)

    n_bars = max(1, -(-max_off // spb))
    roll = torch.zeros(n_bars * spb, spec.num_pitches, dtype=torch.float32)
    for s_on, s_off, pitch in intervals:
        roll[s_on:s_off, pitch] = 1.0
    return roll.reshape(n_bars, spb, spec.num_pitches)


def oracle_crop(bars: torch.Tensor, spec: MidiSpec) -> torch.Tensor:
    """SEMANTICS.md §5 hard slice."""
    return bars[..., spec.pitch_lo:spec.pitch_hi]
