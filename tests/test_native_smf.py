"""Native (C++) SMF parser ≡ pure-Python codec, fuzzed (SEMANTICS.md §1–§3).

Both implement the normative semantics; parity must be exact, including
quantization and bar padding.
"""

import os

import numpy as np
import pytest

from musicvae_tpu import native
from musicvae_tpu.config import MidiSpec
from musicvae_tpu.midi import smf, tensorize

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

SPEC = MidiSpec()


def _random_notes(seed, n, tpq):
    rng = np.random.default_rng(seed)
    notes = []
    for _ in range(n):
        start = int(rng.integers(0, 16 * tpq))
        length = int(rng.integers(1, 3 * tpq))
        notes.append(smf.Note(int(rng.integers(0, 128)), start,
                              start + length, int(rng.integers(1, 128))))
    notes.sort(key=lambda x: (x.start_tick, x.pitch, x.end_tick))
    return notes


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("tpq", [96, 480, 960])
def test_parse_parity_random(seed, tpq):
    data = smf.write_smf(_random_notes(seed, 150, tpq), tpq)
    py = smf.parse_smf(data)
    nat_notes, nat_tpq, nat_tempo, _ = native.parse_smf(data)
    assert nat_tpq == py.ticks_per_quarter
    assert nat_tempo == py.tempo_us_per_quarter
    py_arr = np.array([[n.start_tick, n.end_tick, n.pitch, n.velocity]
                       for n in py.notes], dtype=np.int32).reshape(-1, 4)
    np.testing.assert_array_equal(nat_notes, py_arr)


def test_parse_parity_edge_cases():
    # overlapping same-pitch notes (FIFO), vel-0 note_off, running status
    notes = [smf.Note(60, 0, 400, 100), smf.Note(60, 100, 300, 90),
             smf.Note(72, 0, 50, 80)]
    data = smf.write_smf(notes, 480)
    py = smf.parse_smf(data)
    nat_notes, _, _, _ = native.parse_smf(data)
    py_arr = np.array([[n.start_tick, n.end_tick, n.pitch, n.velocity]
                       for n in py.notes], dtype=np.int32)
    np.testing.assert_array_equal(nat_notes, py_arr)


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        native.parse_smf(b"not a midi file at all")
    with pytest.raises(ValueError):
        native.parse_smf(b"MThd" + b"\x00" * 10)


def test_quantize_parity():
    for tpq in (96, 220, 480):
        data = smf.write_smf(_random_notes(7, 200, tpq), tpq)
        py_midi = smf.parse_smf(data)
        py_events, py_total = tensorize.notes_to_events(py_midi, SPEC, 256)
        nat_notes, nat_tpq, _, _ = native.parse_smf(data)
        nat_events, nat_total = native.quantize_events(
            nat_notes, nat_tpq, SPEC.steps_per_quarter, SPEC.steps_per_bar,
            256)
        assert nat_total == py_total
        np.testing.assert_array_equal(nat_events, py_events)


def test_native_roll_end_to_end():
    """native parse+quantize feeding the jit tensorizer == python path."""
    data = smf.write_smf(_random_notes(11, 100, 480), 480)
    nat_notes, tpq, _, _ = native.parse_smf(data)
    events, total = native.quantize_events(
        nat_notes, tpq, SPEC.steps_per_quarter, SPEC.steps_per_bar, 128)
    roll_native = np.asarray(tensorize.events_to_roll(events, total))
    roll_py = np.asarray(
        tensorize.midi_bytes_to_bars(data, SPEC)).reshape(-1, 128)
    np.testing.assert_array_equal(roll_native, roll_py)


@pytest.mark.parametrize("threads", [1, 4])
def test_corpus_tensorize_native_vs_python(threads):
    """Multithreaded C++ whole-corpus tensorizer ≡ pure-Python path."""
    from musicvae_tpu.data.synthetic import synth_corpus
    from musicvae_tpu.midi.tensorize import (events_to_roll_np,
                                             notes_to_events)

    datas = [p[0] for p in synth_corpus(6, n_bars=5, seed=9)]
    # mix in edge cases: empty file, dense random soup
    datas.append(smf.write_smf([], 480))
    datas.append(smf.write_smf(_random_notes(3, 400, 960), 960))

    native_rolls = native.tensorize_corpus(datas, SPEC.steps_per_quarter,
                                           SPEC.steps_per_bar,
                                           num_threads=threads)
    for data, nat in zip(datas, native_rolls):
        events, total = notes_to_events(smf.parse_smf(data), SPEC, 4096)
        py = events_to_roll_np(events, total)
        np.testing.assert_array_equal(nat.astype(np.float32), py)


def test_corpus_tensorize_error_propagates():
    with pytest.raises(ValueError):
        native.tensorize_corpus([b"not midi"], 24, 96)


def test_stale_library_missing_symbol_falls_back(monkeypatch, tmp_path):
    """A loadable .so missing a newer entry point (stale prebuilt) must
    make load() return None (pure-Python fallback), not raise
    AttributeError forever (review finding: symbol binding sat outside
    the try block)."""
    import ctypes

    from musicvae_tpu import native

    class FakeLib:
        mvae_parse_smf = ctypes.CFUNCTYPE(ctypes.c_int32)()
        # mvae_quantize_events etc. missing → binding raises AttributeError

        def __getattr__(self, name):
            raise AttributeError(name)

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
    monkeypatch.setattr(native, "build", lambda force=False: "fake.so")
    monkeypatch.setattr(native.ctypes, "CDLL", lambda path: FakeLib())
    assert native.load() is None
    assert native._build_failed is True       # and it stays failed
    assert native.available() is False
    # restore module state for other tests
    monkeypatch.setattr(native, "_build_failed", False)


def test_pack_bits_rejects_non_multiple_of_8():
    import pytest as _pytest

    from musicvae_tpu.ops.pack import pack_bits, pack_bits_np

    with _pytest.raises(ValueError, match="multiple of 8"):
        pack_bits_np(np.zeros((4, 100)))
    with _pytest.raises(ValueError, match="multiple of 8"):
        pack_bits(np.zeros((4, 100)))


def test_pack_bits_roundtrips_both_directions():
    """Host-pack/device-unpack (streaming ingest) and device-pack/
    host-unpack (serving pulls) are exact inverses AND produce identical
    packed bytes (same MSB-first layout), for random binary rolls
    including all-zero and all-one rows."""
    import jax

    from musicvae_tpu.ops.pack import (pack_bits, pack_bits_np,
                                       unpack_bits, unpack_bits_np)

    rng = np.random.default_rng(0)
    x = (rng.random((3, 5, 96, 128)) < 0.1).astype(np.uint8)
    x[0, 0] = 0
    x[1, 1] = 1

    packed_host = pack_bits_np(x)
    packed_dev = np.asarray(jax.jit(pack_bits)(x))
    assert packed_dev.dtype == np.uint8
    np.testing.assert_array_equal(packed_host, packed_dev)
    np.testing.assert_array_equal(unpack_bits_np(packed_dev), x)
    np.testing.assert_array_equal(
        np.asarray(unpack_bits(packed_host, np.uint8)), x)


def test_lib_path_read_only_package_dir(monkeypatch, tmp_path):
    """A wheel installed into read-only site-packages ships only the .cpp;
    _lib_path must route the compiled .so to the user cache dir (honoring
    XDG_CACHE_HOME) instead of failing the build and silently losing the
    native path. Writable package dir keeps the in-tree location."""
    import os

    from musicvae_tpu.native import _DIR, _LIB, _lib_path

    assert _lib_path() in (_LIB, os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "musicvae_tpu", "libmvae_native.so"))

    real_access = os.access

    def deny_pkg_dir(path, mode):
        if path == _DIR and mode == os.W_OK:
            return False
        return real_access(path, mode)

    monkeypatch.setattr(os, "access", deny_pkg_dir)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    p = _lib_path()
    assert p == str(tmp_path / "musicvae_tpu" / "libmvae_native.so")
    assert os.path.isdir(tmp_path / "musicvae_tpu")


def test_stale_abi_library_forces_rebuild(tmp_path, monkeypatch):
    """A cached .so with an old ABI version (possible with preserved
    archive mtimes, where the mtime check alone would accept it) must be
    rebuilt AND the rebuilt code actually loaded — dlopen caches by
    pathname, so the loader reopens the rebuilt file through a unique
    temp copy (code-review r4)."""
    import subprocess

    from musicvae_tpu import native

    lib_path = str(tmp_path / "libmvae_native.so")
    stale_src = tmp_path / "stale.c"
    stale_src.write_text("int mvae_abi_version() { return 1; }\n")
    subprocess.run(["g++", "-shared", "-fPIC", "-o", lib_path,
                    str(stale_src)], check=True)
    # future mtime: the mtime freshness check must NOT trigger a rebuild
    future = os.path.getmtime(native._SRC) + 10_000
    os.utime(lib_path, (future, future))

    monkeypatch.setattr(native, "_lib_path", lambda: lib_path)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
    lib = native.load()
    assert lib is not None
    assert lib.mvae_abi_version() == native._ABI_VERSION
    # and it is genuinely functional, not the stale handle
    notes, tpq, _, ts = native.parse_smf(
        smf.write_smf([smf.Note(60, 0, 480, 100)], 480))
    assert notes.shape[0] == 1 and tpq == 480
