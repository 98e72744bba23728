#!/usr/bin/env python
"""Vendor the RoBERTa byte-level BPE tokenizer data for exact CLAP text ids.

The reference tokenizes CLAP text prompts with laion_clap's bundled
RobertaTokenizer (reference given_models.py:592-605). The *engine* is
implemented offline in audio_algebra_tpu/utils/bpe.py (id-exact, certified
in tests/test_bpe.py); the *data* — roberta-base vocab.json + merges.txt,
~1.3 MB — cannot be fetched from a zero-egress image. This script vendors
it on any network-enabled deployment:

    python tools/fetch_tokenizer.py                  # download from HF hub
    python tools/fetch_tokenizer.py --from-dir DIR   # copy from a local dir
    python tools/fetch_tokenizer.py --verify-only    # check existing assets

Files land in audio_algebra_tpu/assets/roberta_tokenizer/, the second
location bpe.find_assets() searches (first is $AA_ROBERTA_VOCAB). Once
present, models/clap.tokenize() produces transformers-identical ids and
tests/test_bpe.py's parity tests promote from skip to run.

Integrity: every vendored file is SHA-256 pinned in SHA256SUMS next to the
assets (trust-on-first-use: recorded at first fetch, verified on every
later fetch/--verify-only). Independent of the pin file, structural
validation always runs: vocab.json must parse to exactly 50,265 entries
with RoBERTa's special ids (<s>=0, <pad>=1, </s>=2, <unk>=3), merges.txt
must carry 50,000 merge rules, and the assembled tokenizer must reproduce
a small set of well-known roberta-base ids.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
ASSET_DIR = REPO / "audio_algebra_tpu" / "assets" / "roberta_tokenizer"
FILES = ("vocab.json", "merges.txt")
URLS = {
    "vocab.json": "https://huggingface.co/roberta-base/resolve/main/vocab.json",
    "merges.txt": "https://huggingface.co/roberta-base/resolve/main/merges.txt",
}


def sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def validate_structure(d: Path) -> None:
    """Hard structural checks — independent of the hash pins."""
    vocab = json.loads((d / "vocab.json").read_text(encoding="utf-8"))
    if len(vocab) != 50265:
        raise SystemExit(f"vocab.json has {len(vocab)} entries, want 50265 "
                         "(not a roberta-base vocab)")
    for tok, want in (("<s>", 0), ("<pad>", 1), ("</s>", 2), ("<unk>", 3)):
        if vocab.get(tok) != want:
            raise SystemExit(f"vocab.json maps {tok!r} to {vocab.get(tok)}, "
                             f"want {want} (not RoBERTa-compatible)")
    lines = (d / "merges.txt").read_text(encoding="utf-8").splitlines()
    merges = [ln for ln in lines if ln and not ln.startswith("#")]
    if len(merges) != 50000:
        raise SystemExit(f"merges.txt has {len(merges)} rules, want 50000")
    # End-to-end: the offline engine over these assets must reproduce
    # known roberta-base encodings (BOS/EOS added by callers, not here).
    sys.path.insert(0, str(REPO))
    from audio_algebra_tpu.utils.bpe import RobertaBPE
    bpe = RobertaBPE.from_assets(d)
    got = bpe.encode_text("Hello world")
    if got[:1] != [31414]:  # "Hello" is a single well-known roberta token
        raise SystemExit(f"engine smoke-encode mismatch: 'Hello world' -> "
                         f"{got} (expected to start with 31414)")
    print(f"structural validation OK ({len(vocab)} vocab entries, "
          f"{len(merges)} merges, smoke-encode ids {got})")


def verify_pins(d: Path, write_if_missing: bool) -> None:
    pin_file = d / "SHA256SUMS"
    sums = {f: sha256(d / f) for f in FILES}
    if pin_file.is_file():
        pinned = dict(line.split()[::-1] for line in
                      pin_file.read_text().splitlines() if line.strip())
        for f in FILES:
            if pinned.get(f) != sums[f]:
                raise SystemExit(
                    f"SHA-256 mismatch for {f}:\n  pinned {pinned.get(f)}\n"
                    f"  actual {sums[f]}\nRefusing. Delete {pin_file} only "
                    "if you intend to re-pin.")
        print(f"SHA-256 pins verified against {pin_file}")
    elif write_if_missing:
        pin_file.write_text("".join(f"{sums[f]}  {f}\n" for f in FILES))
        print(f"pinned (trust-on-first-use) -> {pin_file}")
        for f in FILES:
            print(f"  {sums[f]}  {f}")
    else:
        raise SystemExit(f"no pin file at {pin_file}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--from-dir", type=Path, default=None,
                    help="vendor from a local directory (e.g. an HF cache "
                         "snapshot) instead of downloading")
    ap.add_argument("--verify-only", action="store_true",
                    help="validate existing assets; fetch nothing")
    args = ap.parse_args()

    if args.verify_only:
        for f in FILES:
            if not (ASSET_DIR / f).is_file():
                raise SystemExit(f"missing {ASSET_DIR / f}")
        validate_structure(ASSET_DIR)
        verify_pins(ASSET_DIR, write_if_missing=True)
        return

    ASSET_DIR.mkdir(parents=True, exist_ok=True)
    for f in FILES:
        dst = ASSET_DIR / f
        if args.from_dir is not None:
            src = args.from_dir / f
            if not src.is_file():
                raise SystemExit(f"--from-dir has no {f} ({src})")
            shutil.copyfile(src, dst)
            print(f"copied {src} -> {dst}")
        else:
            print(f"downloading {URLS[f]} ...")
            try:
                with urllib.request.urlopen(URLS[f], timeout=60) as r:
                    dst.write_bytes(r.read())
            except OSError as e:
                raise SystemExit(
                    f"download failed ({e}). On an offline machine, vendor "
                    "from any transformers cache with --from-dir "
                    "~/.cache/huggingface/hub/models--roberta-base/"
                    "snapshots/<rev>/")
            print(f"  -> {dst} ({dst.stat().st_size} bytes)")

    validate_structure(ASSET_DIR)
    verify_pins(ASSET_DIR, write_if_missing=True)
    print("done: models/clap.tokenize() now produces exact RoBERTa ids; "
          "tests/test_bpe.py parity tests will run.")


if __name__ == "__main__":
    main()
