"""Quantitative evaluation CLI: oversmoothing metrics + MCD over a test set.

    python -m tts_arabic_tpu.apps.evaluate --labels data/test_phon.txt \
        --wav-dir <corpus wavs> --checkpoint <ckpt> --out metrics.json

The reference ships its oversmoothing/DTW suite as an unwired library
(SURVEY.md §4); this runner synthesizes each test utterance, computes
ground-truth mels from the corpus audio, and reports DTW-aligned
oversmoothing deltas + MCD per utterance and in aggregate.
"""
from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np

from ..data.dataset import ArabDataset, DEFAULT_LABEL_PATTERN
from ..eval import mcd, oversmoothing_metrics_aligned
from ..eval.oversmoothing import compute_mel_oversmoothing_metrics
from ..runtime.cache import enable_compilation_cache


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--labels", default="data/test_phon.txt")
    parser.add_argument("--wav-dir", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--model", choices=["fastpitch", "tacotron2"],
                        default="fastpitch")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--out", default=None)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--copy-synthesis", action="store_true",
                        help="use the ground-truth mel as the prediction "
                        "(no model): sanity-checks the metric plumbing — "
                        "MCD and every DTW-aligned delta must come out 0")
    args = parser.parse_args(argv)

    if args.cpu:
        from ..runtime.utils import force_cpu_backend
        force_cpu_backend()
    enable_compilation_cache()

    ds = ArabDataset(args.labels, args.wav_dir,
                     label_pattern=DEFAULT_LABEL_PATTERN)
    n = min(len(ds), args.limit or len(ds))

    if args.copy_synthesis:
        # prediction := ground truth — metric-plumbing sanity mode (MCD and
        # every DTW-aligned delta must come out exactly 0)
        mels_pred = [ds._load_logmel(ds.data[i][1])[0] for i in range(n)]
    else:
        if args.model == "fastpitch":
            from ..infer import FastPitchTTS
            model = FastPitchTTS(args.checkpoint, arabic_in=False)
        else:
            from ..infer import Tacotron2TTS
            model = Tacotron2TTS(args.checkpoint, arabic_in=False)

        # synthesize from the corpus phoneme transcripts (already tokenized
        # by the dataset, so G2P differences can't skew the comparison)
        from ..text import ids_to_tokens
        mels_pred = []
        for k in range(0, n, args.batch_size):
            ids_list = [np.asarray(ds.data[i][0])
                        for i in range(k, min(n, k + args.batch_size))]
            if args.model == "fastpitch":
                mel, mel_lens, inverse, _ = model._infer_batch_mel(
                    ids_list, 1.0, 0, 1.0, 0.0)
                mel = np.asarray(mel)
                for i in inverse:
                    mels_pred.append(mel[i, : mel_lens[i]].T)
            else:
                tokens_list = [ids_to_tokens(x) for x in ids_list]
                mel_post, mel_lens, _, _, inverse = model._infer_batch(
                    tokens_list, 0)
                for j, i in enumerate(inverse):
                    mels_pred.append(mel_post[i, : mel_lens[i]].T)

    per_utt = []
    for i in range(n):
        mel_ref, _ = ds._load_logmel(ds.data[i][1])
        mel_pred = mels_pred[i]
        row = {"utt": str(ds.data[i][1].name),
               "mcd": mcd(mel_pred, mel_ref)}
        row.update(oversmoothing_metrics_aligned(mel_pred, mel_ref))
        for k, v in compute_mel_oversmoothing_metrics(
                mel_pred, reduction="median").items():
            if np.isscalar(v):
                row[f"pred_{k}"] = float(v)
        per_utt.append(row)

    agg = {}
    for k in per_utt[0]:
        if k == "utt":
            continue
        vals = [r[k] for r in per_utt if np.isfinite(r[k])]
        agg[k] = float(np.mean(vals)) if vals else float("nan")
    report = {"n_utterances": n, "aggregate": agg, "per_utterance": per_utt}
    text = json.dumps(report, indent=1)
    if args.out:
        pathlib.Path(args.out).write_text(text)
        print(f"wrote {args.out}")
    print(json.dumps({"n": n, **{k: round(v, 4) for k, v in agg.items()}}))


if __name__ == "__main__":
    main()
