#!/usr/bin/env python
"""Accelerate-variant entry point (reference train_aa_mixer_accel.py).

The reference shipped a second, self-contained HF-Accelerate training script
duplicating the DVAE/AA/losses inline (557 LoC). In the rebuild there is one
canonical jitted training path; this entry point exists for CLI parity and
forwards to it (same flags, same behavior — Accelerate's device handling is
subsumed by the jax mesh).
"""
from train_aa_mixer import main

if __name__ == "__main__":
    print("train_aa_mixer_accel: the accelerate variant is subsumed by the "
          "mesh-parallel trainer; forwarding to train_aa_mixer.main()")
    main()
