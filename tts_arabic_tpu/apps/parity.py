"""Checkpoint-parity harness: our TPU pipeline vs the reference torch
implementation on the SAME weights (BASELINE.md quality gate).

    python -m tts_arabic_tpu.apps.parity --checkpoint pretrained/fastpitch_ar_adv.pth \
        [--vocoder-sd pretrained/hifigan-asc-v1/hifigan-asc.pth] [--n 10]

Loads a reference-format `.pth` into both stacks, synthesizes the held-out
prompts with each, and reports per-utterance + aggregate mel MCD (and wave
SNR when a vocoder checkpoint is given). With `--selftest` it generates a
random-weight reference-format checkpoint first, so the harness runs (and
proves ~0 MCD) even with no downloaded weights — the reference publishes no
checkpoints, so structural parity on shared weights IS the quality gate.

Requires the reference repo mounted (default /root/reference) for the torch
side.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys

import numpy as np


def _load_reference(ref_dir):
    here = pathlib.Path(__file__).resolve().parents[2] / "tests"
    sys.path.insert(0, str(here))
    from ref_loader import load_reference
    load_reference(ref_dir)


def make_selftest_vocoder(path, config_path, seed: int = 1):
    """Write a reference-format HiFi-GAN .pth ({'generator': state_dict})
    with random weights."""
    import json
    import torch
    from vocoder.hifigan.models import Generator as RefGenerator

    class _AttrDict(dict):
        __getattr__ = dict.__getitem__

    with open(config_path) as f:
        h = _AttrDict(json.load(f))
    torch.manual_seed(seed)
    gen = RefGenerator(h)
    torch.save({"generator": gen.state_dict()}, path)
    return path


def make_selftest_checkpoint(path, n_symbols: int = 40, seed: int = 0):
    """Write a reference-format FastPitch .pth with random weights (+ biased
    durations so synthesis is non-trivial)."""
    import torch
    from models.fastpitch.fastpitch.model import FastPitch as RefFastPitch
    from models.fastpitch import net_config

    cfg = dict(net_config)
    cfg["n_symbols"] = n_symbols
    torch.manual_seed(seed)
    model = RefFastPitch(**cfg)
    with torch.no_grad():
        model.duration_predictor.fc.bias += 2.0
    torch.save({"model": model.state_dict(), "config": cfg}, path)
    return path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--reference-dir", default="/root/reference")
    parser.add_argument("--list", default=None)
    parser.add_argument("--n", type=int, default=10)
    parser.add_argument("--selftest", action="store_true",
                        help="generate random reference-format ckpts first")
    parser.add_argument("--vocoder-sd", default=None,
                        help="HiFi-GAN .pth: also compare waveforms (SNR)")
    parser.add_argument("--vocoder-config", default=None,
                        help="HiFi-GAN config.json (default: the "
                             "reference's hifigan-asc-v1)")
    parser.add_argument("--out", default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        from ..runtime.utils import force_cpu_backend
        force_cpu_backend()

    _load_reference(args.reference_dir)
    root = pathlib.Path(__file__).resolve().parents[2]

    voc_config = args.vocoder_config or str(
        pathlib.Path(args.reference_dir)
        / "pretrained/hifigan-asc-v1/config.json")

    ckpt = args.checkpoint
    voc_sd = args.vocoder_sd
    if args.selftest or ckpt is None:
        ckpt = "/tmp/parity_selftest_fastpitch.pth"
        make_selftest_checkpoint(ckpt)
        print(f"selftest checkpoint -> {ckpt}")
        if voc_sd is None:
            voc_sd = "/tmp/parity_selftest_hifigan.pth"
            make_selftest_vocoder(voc_sd, voc_config)
            print(f"selftest vocoder -> {voc_sd}")

    label = re.compile(r'"[^"]+"\s+"(?P<text>[^"]+)"')
    list_path = args.list or (root / "data" / "infer_test.txt")
    lines = []
    for line in pathlib.Path(list_path).read_text(
            encoding="utf-8").splitlines():
        if line.strip():
            m = label.match(line)
            lines.append(m.group("text") if m else line.strip())
    lines = lines[: args.n]

    # --- torch reference side ----------------------------------------------
    import torch
    from models.fastpitch.fastpitch.model import FastPitch as RefFastPitch
    from tts_arabic_tpu import text as text_frontend

    sd = torch.load(ckpt, map_location="cpu", weights_only=False)
    ref = RefFastPitch(**sd["config"]).eval()
    ref.load_state_dict(sd["model"])

    def ref_ttmel(buckw):
        ids = text_frontend.tokens_to_ids(
            text_frontend.buckwalter_to_tokens(buckw, append_space=False))
        with torch.no_grad():
            mel, *_ = ref.infer(torch.LongTensor(ids)[None])
        return mel[0].numpy()  # [80, T]

    # --- our side -----------------------------------------------------------
    import jax
    import jax.numpy as jnp
    from tts_arabic_tpu.infer import FastPitchTTS
    ours = FastPitchTTS(ckpt, arabic_in=False)

    # --- optional vocoder side (wave SNR) ------------------------------------
    ref_gen = our_voc_apply = our_voc_vars = None
    if voc_sd is not None:
        from vocoder import load_hifigan  # reference loader (:3-20)
        from tts_arabic_tpu.models.torch_import import (
            hifigan_params_from_torch)
        from tts_arabic_tpu.runtime.checkpoint import load_torch_state_dict
        from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig
        ref_gen = load_hifigan(voc_sd, voc_config)
        cfg_v = HiFiGANConfig.from_json(voc_config)
        sd_v = load_torch_state_dict(voc_sd)
        sd_v.pop("__extras__", None)
        our_voc_vars = hifigan_params_from_torch(sd_v, cfg_v)
        our_voc_apply = jax.jit(Generator(cfg_v).apply)

    from tts_arabic_tpu.eval import mcd
    rows = []
    for text in lines:
        mel_ref = ref_ttmel(text)
        mel_our = ours.ttmel_single(text)
        T = min(mel_ref.shape[1], mel_our.shape[1])
        row = {
            "text": text[:40],
            "frames_ref": int(mel_ref.shape[1]),
            "frames_ours": int(mel_our.shape[1]),
            "mcd": mcd(mel_our[:, :T], mel_ref[:, :T], align=False),
            "mel_max_abs_diff": float(
                np.abs(mel_our[:, :T] - mel_ref[:, :T]).max()),
        }
        if ref_gen is not None:
            with torch.no_grad():
                w_ref = ref_gen(
                    torch.from_numpy(mel_ref[None]))[0, 0].numpy()
            w_our = np.asarray(our_voc_apply(
                our_voc_vars, jnp.asarray(mel_our.T[None])))[0]
            n = min(len(w_ref), len(w_our))
            err = float(np.sum((w_our[:n] - w_ref[:n]) ** 2))
            row["wave_snr_db"] = float(
                10.0 * np.log10(np.sum(w_ref[:n] ** 2) / max(err, 1e-30)))
        rows.append(row)
    agg = {
        "mean_mcd": float(np.mean([r["mcd"] for r in rows])),
        "max_mcd": float(np.max([r["mcd"] for r in rows])),
        "max_abs_diff": float(np.max([r["mel_max_abs_diff"] for r in rows])),
        "length_mismatches": int(sum(r["frames_ref"] != r["frames_ours"]
                                     for r in rows)),
    }
    if rows and "wave_snr_db" in rows[0]:
        agg["min_wave_snr_db"] = float(
            np.min([r["wave_snr_db"] for r in rows]))
    report = {"checkpoint": str(ckpt), "n": len(rows), "aggregate": agg,
              "per_utterance": rows}
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps({"n": len(rows), **{k: (round(v, 5)
          if isinstance(v, float) else v) for k, v in agg.items()}}))
    return report


if __name__ == "__main__":
    main()
