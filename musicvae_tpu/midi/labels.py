"""Chord/key label inference for real MIDI corpora (BASELINE config 4).

The C4 conditional VAE conditions on chord/key classes in [0, 24):
``root * 2 + minor`` — 12 pitch-class roots x {major=0, minor=1}, the same
vocabulary data/synthetic.py emits. Synthetic pieces carry ground-truth
labels; real ``.mid`` files don't, and round 1 silently conditioned every
real file on chord=0/key=0. This module infers labels host-side from the
tensorized bar rolls (uint8 [n_bars, T, 128]) during preprocessing:

- key: Krumhansl-Schmuckler — duration-weighted pitch-class histogram
  correlated against the 24 rotated K-S major/minor profiles (Krumhansl
  1990, public profile constants), argmax.
- chord: duration-weighted triad template match per window — 24 templates
  (root major {0,4,7} / minor {0,3,7}), scored as in-triad mass minus a
  penalty on out-of-triad mass so dense textures don't saturate all
  templates equally.

Both are deterministic pure-numpy functions of the roll; an explicit
sidecar label file always wins (cli.py --labels).
"""

from __future__ import annotations

import numpy as np

# Krumhansl-Schmuckler key profiles (probe-tone ratings, C root).
KS_MAJOR = np.array([6.35, 2.23, 3.48, 2.33, 4.38, 4.09,
                     2.52, 5.19, 2.39, 3.66, 2.29, 2.88])
KS_MINOR = np.array([6.33, 2.68, 3.52, 5.38, 2.60, 3.53,
                     2.54, 4.75, 3.98, 2.69, 3.34, 3.17])

_TRIAD_OFFSETS = (np.array([0, 4, 7]), np.array([0, 3, 7]))  # major, minor


def pc_histogram(roll: np.ndarray) -> np.ndarray:
    """Duration-weighted pitch-class histogram of a roll.

    roll: uint8/float [..., T, 128] (any leading dims). Active cells count
    once per time step, i.e. weight == duration on the step grid.
    """
    per_pitch = np.asarray(roll, dtype=np.float64).reshape(-1, 128).sum(0)
    return np.bincount(np.arange(128) % 12, weights=per_pitch, minlength=12)


def estimate_key(roll: np.ndarray) -> int:
    """K-S key class in [0, 24) (root*2 + minor); 0 (C major) if silent."""
    hist = pc_histogram(roll)
    if hist.sum() <= 0:
        return 0
    scores = np.empty(24)
    for root in range(12):
        rotated = np.roll(hist, -root)
        for minor, profile in ((0, KS_MAJOR), (1, KS_MINOR)):
            scores[root * 2 + minor] = _pearson(rotated, profile)
    return int(np.argmax(scores))


def estimate_chord(roll: np.ndarray, fallback: int = 0) -> int:
    """Best-matching triad class in [0, 24) for one window's roll.

    Score = in-triad pitch-class mass − 0.5 * out-of-triad mass (the
    penalty separates C major from A minor when the 6th degree sounds).
    Returns ``fallback`` (typically the piece key) for silent windows.
    """
    hist = pc_histogram(roll)
    total = hist.sum()
    if total <= 0:
        return int(fallback)
    scores = np.empty(24)
    for root in range(12):
        for minor, offs in enumerate(_TRIAD_OFFSETS):
            in_triad = hist[(root + offs) % 12].sum()
            scores[root * 2 + minor] = in_triad - 0.5 * (total - in_triad)
    return int(np.argmax(scores))


def _pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a - a.mean()
    b = b - b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom > 0 else 0.0
