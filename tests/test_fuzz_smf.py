"""Fuzz robustness: both SMF parsers must reject arbitrary/mutated bytes
with their documented error types — never crash, hang, or raise anything
else. Particularly important for the C++ parser (bounds-checked Reader).
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from musicvae_tpu import native
from musicvae_tpu.midi import smf


def _valid_file(seed):
    rng = np.random.default_rng(seed)
    notes = [smf.Note(int(rng.integers(0, 128)), int(s := rng.integers(0, 5000)),
                      int(s + rng.integers(1, 2000)), 100)
             for _ in range(50)]
    notes.sort(key=lambda n: (n.start_tick, n.pitch, n.end_tick))
    return smf.write_smf(notes, 480)


def _mutations(seed, n=150):
    """Random buffers + bit/byte-mutated valid SMF files + truncations."""
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n // 3):
        cases.append(rng.integers(0, 256, size=rng.integers(0, 200),
                                  dtype=np.uint8).tobytes())
    base = bytearray(_valid_file(seed))
    for _ in range(n // 3):
        m = bytearray(base)
        for _ in range(int(rng.integers(1, 8))):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        cases.append(bytes(m))
    for _ in range(n - len(cases)):
        cases.append(bytes(base[:int(rng.integers(0, len(base)))]))
    return cases


@pytest.mark.parametrize("seed", range(4))
def test_python_parser_never_crashes(seed):
    for data in _mutations(seed):
        try:
            midi = smf.parse_smf(data)
            # accepted input must produce a well-formed note list
            for n in midi.notes:
                assert 0 <= n.pitch < 128 and n.end_tick > n.start_tick
        except smf.SMFError:
            pass


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("seed", range(4))
def test_native_parser_never_crashes(seed):
    for data in _mutations(seed):
        try:
            notes, tpq, _, _ = native.parse_smf(data)
            assert tpq > 0
            if len(notes):
                assert (notes[:, 2] >= 0).all() and (notes[:, 2] < 128).all()
                assert (notes[:, 1] > notes[:, 0]).all()
        except ValueError:
            pass


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("seed", range(4))
def test_parsers_agree_on_acceptance(seed):
    """When either parser accepts a mutated file, both must agree on the
    note list (or both reject) — SEMANTICS.md §1 has one answer."""
    for data in _mutations(seed, n=60):
        py_ok = nat_ok = True
        try:
            midi = smf.parse_smf(data)
        except smf.SMFError:
            py_ok = False
        try:
            nat_notes, nat_tpq, _, _ = native.parse_smf(data)
        except ValueError:
            nat_ok = False
        assert py_ok == nat_ok, f"acceptance disagreement on {data[:40]!r}"
        if py_ok:
            py_arr = np.array([[n.start_tick, n.end_tick, n.pitch,
                                n.velocity] for n in midi.notes],
                              dtype=np.int32).reshape(-1, 4)
            np.testing.assert_array_equal(nat_notes, py_arr)


# --------------------------------------------------------------------------
# Deterministic regressions (divergences found by fuzzing / review)
# --------------------------------------------------------------------------

def _smf(track: bytes, tpq: int = 480) -> bytes:
    return (struct.pack(">4sIHHH", b"MThd", 6, 0, 1, tpq)
            + struct.pack(">4sI", b"MTrk", len(track)) + track)


def test_track_ending_in_bare_delta_rejected_by_both():
    """MTrk whose only content is a delta byte: no status byte follows.
    ASan-confirmed one-byte overread in the native parser before the fix
    (smf_parser.cpp bounds-checks r.pos < tend before the status read)."""
    data = _smf(b"\x00")
    with pytest.raises(smf.SMFError):
        smf.parse_smf(data)
    if native.available():
        with pytest.raises(ValueError):
            native.parse_smf(data)


def test_tick_overflow_rejected_by_both():
    """Cumulative delta beyond INT32_MAX: the native parser's int32 note
    fields would silently wrap while pure Python (unbounded ints) kept
    counting — both now reject (error -7 / SMFError 'tick overflow')."""
    ev = b"\xff\xff\xff\x7f" + bytes([0x90, 60, 100])   # max varlen delta
    track = ev * 9 + b"\x00\xff\x2f\x00"                # 9 * 0x0FFFFFFF > 2^31
    data = _smf(track)
    with pytest.raises(smf.SMFError, match="tick overflow"):
        smf.parse_smf(data)
    if native.available():
        with pytest.raises(ValueError, match="tick overflow"):
            native.parse_smf(data)
    # one below the limit still parses (8 * 0x0FFFFFFF < 2^31 - 1)
    ok = _smf(ev * 8 + b"\x00\xff\x2f\x00")
    assert smf.parse_smf(ok).notes
    if native.available():
        notes, _, _, _ = native.parse_smf(ok)
        assert len(notes)


def test_writer_rejects_velocity_zero_and_bad_notes():
    """A vel=0 note_on re-parses as note_off, silently corrupting the
    round trip — write_smf must refuse instead of emitting it."""
    with pytest.raises(smf.SMFError, match="velocity"):
        smf.write_smf([smf.Note(60, 0, 10, 0)], 480)
    with pytest.raises(smf.SMFError, match="velocity"):
        smf.write_smf([smf.Note(60, 0, 10, 5)], 480, velocity=128)
    with pytest.raises(smf.SMFError, match="pitch"):
        smf.write_smf([smf.Note(128, 0, 10, 100)], 480)
    with pytest.raises(smf.SMFError, match="interval"):
        smf.write_smf([smf.Note(60, 10, 10, 100)], 480)


# --------------------------------------------------------------------------
# ASan/UBSan sweep of the native parser over the fuzz corpus
# --------------------------------------------------------------------------

@pytest.fixture(scope="session")
def asan_harness(tmp_path_factory):
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native_asan_harness.cpp")
    parser = os.path.join(here, os.pardir, "musicvae_tpu", "native",
                          "smf_parser.cpp")
    exe = str(tmp_path_factory.mktemp("asan") / "harness")
    try:
        subprocess.run(
            ["g++", "-O1", "-g", "-std=c++17",
             "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
             parser, src, "-o", exe],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"sanitizer toolchain unavailable: {e}")
    return exe


def test_native_parser_asan_clean(asan_harness):
    """Every fuzz case + known regressions through an ASan+UBSan build:
    any overread/UB aborts the harness with a sanitizer report."""
    cases = []
    for seed in range(4):
        cases.extend(_mutations(seed))
    cases.append(_smf(b"\x00"))                       # bare-delta overread
    cases.append(_smf(b""))                           # empty track
    cases.append(_smf(b"\x00\xff\x2f\x00"))           # EOT only
    blob = b"".join(struct.pack(">I", len(c)) + c for c in cases)
    proc = subprocess.run([asan_harness], input=blob, capture_output=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")[:2000]
    accepted, rejected = map(int, proc.stdout.split())
    assert accepted + rejected == len(cases)
