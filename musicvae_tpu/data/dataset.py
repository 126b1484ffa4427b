"""Piano-roll dataset + batch iterator (SURVEY §2.1 #3).

The reference wraps pre-tensorized rolls (likely an .npy cache) in a torch
Dataset/DataLoader serving 1/4/16-bar windows plus prev-bar context
[SURVEY §2.1 #3, RECON]. Rebuild: tensorize once (jit-able stage), cache as
one contiguous numpy array of bar windows, and serve batches as numpy — the
device transfer and sharding happen in the trainer (parallel.shard_batch).

Windows are every contiguous ``num_bars`` run inside a piece; prev-bar
context comes free since training decode teacher-forces on the in-window
previous bar (models/vae.py).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from musicvae_tpu.config import MidiSpec
from musicvae_tpu.midi import tensorize


class PianoRollDataset:
    def __init__(self, windows: np.ndarray, chords: np.ndarray,
                 keys: np.ndarray):
        """windows: [N, num_bars, T, P] f32; chords: [N, num_bars] i32;
        keys: [N] i32."""
        assert windows.ndim == 4
        self.windows = windows
        self.chords = chords
        self.keys = keys

    # -- construction --------------------------------------------------------

    @classmethod
    def from_corpus(cls, pieces: Sequence[Tuple[bytes, int, int]],
                    spec: MidiSpec, num_bars: int) -> "PianoRollDataset":
        """pieces: (smf_bytes, chord_class, key_class) triples."""
        all_bars = tensorize.corpus_to_bars([p[0] for p in pieces], spec)
        xs: List[np.ndarray] = []
        cs: List[np.ndarray] = []
        ks: List[int] = []
        for bars, (_, chord, key) in zip(all_bars, pieces):
            n = bars.shape[0]
            for start in range(0, n - num_bars + 1):
                xs.append(bars[start:start + num_bars])
                cs.append(np.full((num_bars,), chord, np.int32))
                ks.append(key)
        if not xs:
            raise ValueError("corpus produced no windows "
                             f"(need pieces with >= {num_bars} bars)")
        return cls(np.stack(xs).astype(np.float32),
                   np.stack(cs), np.asarray(ks, np.int32))

    @classmethod
    def load_npy(cls, path: str) -> "PianoRollDataset":
        with np.load(path) as z:
            return cls(z["windows"], z["chords"], z["keys"])

    def save_npy(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(path, windows=self.windows, chords=self.chords,
                            keys=self.keys)

    # -- serving -------------------------------------------------------------

    def __len__(self) -> int:
        return self.windows.shape[0]

    def batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        return {"x": self.windows[idx], "chord": self.chords[idx],
                "key_sig": self.keys[idx]}

    def iterator(self, batch_size: int, seed: int = 0,
                 drop_remainder: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite shuffled epochs; indices resampled per epoch."""
        rng = np.random.default_rng(seed)
        n = len(self)
        if n < batch_size:
            # tile small datasets up to one batch (tiny tests / overfit runs)
            reps = -(-batch_size // n)
            ds = PianoRollDataset(np.tile(self.windows, (reps, 1, 1, 1)),
                                  np.tile(self.chords, (reps, 1)),
                                  np.tile(self.keys, reps))
            yield from ds.iterator(batch_size, seed, drop_remainder)
            return
        while True:
            perm = rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                yield self.batch(perm[i:i + batch_size])
