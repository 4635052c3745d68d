"""Batched synthesis CLI (reference `inference.py` equivalent).

    python -m tts_arabic_tpu.apps.inference --list data/infer_text.txt \
        --model fastpitch --checkpoint <ckpt-or-pth> --out-dir samples/

Synthesizes every line of the list file, writes wavs + an HTML listening
page. Args mirror the reference surface (inference.py:86-99): list, model,
checkpoint, vocoder_sd, vocoder_config, out_dir, speed, denoise, batch_size,
cpu.
"""
from __future__ import annotations

import argparse
import pathlib
import re
import sys

import numpy as np

from ..audio import save_wav
from ..runtime.cache import enable_compilation_cache
from .html_report import make_sample_entry, write_page

_LABEL = re.compile(r'"[^"]+"\s+"(?P<text>[^"]+)"')


def read_lines(path):
    out = []
    for line in pathlib.Path(path).read_text(encoding="utf-8").splitlines():
        if not line.strip():
            continue
        m = _LABEL.match(line)
        out.append(m.group("text") if m else line.strip())
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--list", default="data/infer_text.txt")
    parser.add_argument("--model", choices=["fastpitch", "tacotron2"],
                        default="fastpitch")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--vocoder-sd", default=None)
    parser.add_argument("--vocoder-config", default=None)
    parser.add_argument("--out-dir", default="samples")
    parser.add_argument("--speed", type=float, default=1.0)
    parser.add_argument("--denoise", type=float, default=0.005)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--speaker-id", type=int, default=0)
    parser.add_argument("--vowelizer", default=None)
    parser.add_argument("--buckwalter", action="store_true",
                        help="input lines are Buckwalter, not Arabic script")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="opt-in int8 MRF vocoder serving path "
                             "(static calibration at startup)")
    args = parser.parse_args(argv)

    if args.cpu:
        from ..runtime.utils import force_cpu_backend
        force_cpu_backend()
    enable_compilation_cache()

    import jax.numpy as jnp
    if args.model == "fastpitch":
        from ..infer import FastPitch2Wave
        tts = FastPitch2Wave(
            args.checkpoint, vocoder_sd=args.vocoder_sd,
            vocoder_config=args.vocoder_config, vowelizer=args.vowelizer,
            arabic_in=not args.buckwalter,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
            quantize=args.quantize)
    else:
        from ..infer import Tacotron2Wave
        tts = Tacotron2Wave(
            args.checkpoint, vocoder_sd=args.vocoder_sd,
            vocoder_config=args.vocoder_config, vowelizer=args.vowelizer,
            arabic_in=not args.buckwalter, quantize=args.quantize)

    lines = read_lines(args.list)
    print(f"synthesizing {len(lines)} utterances with {args.model}...")
    waves = tts.tts(lines, speed=args.speed, denoise=args.denoise,
                    speaker_id=args.speaker_id, batch_size=args.batch_size)

    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    entries = []
    total_sec = 0.0
    for i, (text, wave) in enumerate(zip(lines, waves)):
        name = f"wave_{i:04d}.wav"
        save_wav(out_dir / name, np.asarray(wave), tts.sample_rate)
        total_sec += len(wave) / tts.sample_rate
        entries.append(make_sample_entry(text, name, label=f"#{i}"))
    page = write_page(out_dir / "index.html", entries,
                      title=f"{args.model} samples")
    print(f"wrote {len(waves)} wavs ({total_sec:.1f}s audio) + {page}")


if __name__ == "__main__":
    main()
