"""Fuzz robustness: both SMF parsers must reject arbitrary/mutated bytes
with their documented error types — never crash, hang, or raise anything
else. Particularly important for the C++ parser (bounds-checked Reader).
"""

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
            notes, tpq, _ = native.parse_smf(data)
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
            nat_notes, nat_tpq, _ = native.parse_smf(data)
        except ValueError:
            nat_ok = False
        assert py_ok == nat_ok, f"acceptance disagreement on {data[:40]!r}"
        if py_ok:
            py_arr = np.array([[n.start_tick, n.end_tick, n.pitch,
                                n.velocity] for n in midi.notes],
                              dtype=np.int32).reshape(-1, 4)
            np.testing.assert_array_equal(nat_notes, py_arr)
