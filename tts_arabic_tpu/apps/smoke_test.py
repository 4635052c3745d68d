"""Single-sentence smoke test CLI (reference `test.py` equivalent).

    python -m tts_arabic_tpu.apps.smoke_test --text "..." --out-dir out/

Synthesizes one sentence, writes wav + mel PNG + HTML page; optional
playback via sounddevice when available (test.py:91-96 behavior).
"""
from __future__ import annotations

import argparse
import pathlib

import numpy as np

from ..audio import save_wav
from ..runtime.cache import enable_compilation_cache
from .html_report import make_sample_entry, write_page

DEFAULT_TEXT = "اَلسَّلامُ عَلَيكُم يَا صَدِيقِي"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--text", default=DEFAULT_TEXT)
    parser.add_argument("--model", choices=["fastpitch", "tacotron2"],
                        default="fastpitch")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--vocoder-sd", default=None)
    parser.add_argument("--vocoder-config", default=None)
    parser.add_argument("--out-dir", default="samples/test")
    parser.add_argument("--speed", type=float, default=1.0)
    parser.add_argument("--denoise", type=float, default=0.005)
    parser.add_argument("--vowelizer", default=None)
    parser.add_argument("--buckwalter", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--play", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        from ..runtime.utils import force_cpu_backend
        force_cpu_backend()
    enable_compilation_cache()

    if args.model == "fastpitch":
        from ..infer import FastPitch2Wave
        tts = FastPitch2Wave(args.checkpoint, vocoder_sd=args.vocoder_sd,
                             vocoder_config=args.vocoder_config,
                             vowelizer=args.vowelizer,
                             arabic_in=not args.buckwalter)
    else:
        from ..infer import Tacotron2Wave
        tts = Tacotron2Wave(args.checkpoint, vocoder_sd=args.vocoder_sd,
                            vocoder_config=args.vocoder_config,
                            vowelizer=args.vowelizer,
                            arabic_in=not args.buckwalter)

    wave, mel = tts.tts(args.text, speed=args.speed, denoise=args.denoise,
                        return_mel=True)
    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_wav(out / "sample.wav", np.asarray(wave), tts.sample_rate)

    from ..eval.plotting import plot_mel
    fig = plot_mel(mel, title=args.text[:40])
    fig.savefig(out / "mel.png", dpi=120)

    write_page(out / "index.html",
               [make_sample_entry(args.text, "sample.wav",
                                  label=args.model)],
               title="smoke test")
    dur = len(wave) / tts.sample_rate
    print(f"ok: {dur:.2f}s audio -> {out}/sample.wav, mel.png, index.html")

    if args.play:
        try:
            import sounddevice
            sounddevice.play(np.asarray(wave), tts.sample_rate,
                             blocking=True)
        except Exception as e:
            print(f"(playback unavailable: {e})")


if __name__ == "__main__":
    main()
