#!/usr/bin/env python
"""Render pedalboard goldens for the effect-bank fidelity tests.

Run this ONCE on any machine where Spotify's pedalboard is installed
(`pip install pedalboard`) — this zero-egress image cannot — and commit
the outputs:

    python tools/make_pedalboard_goldens.py
    git add tests/goldens/pedalboard/*.npz

Each golden is one (effect, knob) render of a fixed deterministic test
signal through the REAL pedalboard plugin (the same JUCE C++ the
reference's corpora came through — reference xae_dataset.ipynb cell 27).
tests/test_effects.py::test_against_pedalboard_golden then asserts
ops/effects.py within per-effect rel-RMS tolerances (exact-algorithm
effects at float level, documented approximations at behavioral level —
see docs/effects_fidelity.md). Goldens are ~100 KB each; the signal is
short (8192 samples) on purpose.
"""
import pathlib
import sys

import numpy as np

SR = 48000
N = 8192
OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "goldens" / \
    "pedalboard"

# (effect, ctor kwargs name, knob values) — the reference's knob names and
# sweep endpoints + midpoint (xae_dataset.ipynb cell 27)
CASES = [
    ("Gain", "gain_db", [-12.0, 6.0]),
    ("Distortion", "drive_db", [10.0, 25.0]),
    ("Reverb", "room_size", [0.2, 0.8]),
    ("HighpassFilter", "cutoff_frequency_hz", [200.0, 2000.0]),
    ("LowpassFilter", "cutoff_frequency_hz", [200.0, 2000.0]),
    ("Compressor", "threshold_db", [-50.0, -10.0]),
    ("Chorus", "rate_hz", [1.0]),
    ("Delay", "delay_seconds", [0.05]),     # < N/SR so the echo lands
    ("Phaser", "rate_hz", [1.0]),
    ("PitchShift", "semitones", [4.0, -5.0]),
]

EXTRA_KWARGS = {"Compressor": {"ratio": 25}}   # reference cell 27 'others'


def test_signal() -> np.ndarray:
    """Deterministic stereo probe: two tones + a click + noise floor."""
    t = np.arange(N) / SR
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1765 * t)).astype(np.float32)
    rng = np.random.default_rng(12345)
    x = x + 0.01 * rng.standard_normal(N).astype(np.float32)
    x[100] += 0.5                                   # transient
    return np.stack([x, x * 0.9])


def main():
    try:
        import pedalboard
    except ImportError:
        print("pedalboard is not installed; run where it is "
              "(pip install pedalboard)")
        return 1
    OUT.mkdir(parents=True, exist_ok=True)
    x = test_signal()
    for name, knob_name, knobs in CASES:
        cls = getattr(pedalboard, name)
        for knob in knobs:
            fx = cls(**{knob_name: knob}, **EXTRA_KWARGS.get(name, {}))
            y = pedalboard.Pedalboard([fx])(x, SR)
            path = OUT / f"{name}_{knob:g}.npz"
            np.savez_compressed(path, effect=name, knob=np.float64(knob),
                                knob_name=knob_name, sample_rate=SR,
                                x=x, y=np.asarray(y, np.float32),
                                pedalboard_version=pedalboard.__version__)
            print(f"wrote {path} ({y.shape})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
