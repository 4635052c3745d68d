"""RTF benchmarks for every BASELINE.md config on one TPU chip.

Prints ONE headline JSON line (FastPitch + HiFi-GAN end-to-end RTF, the
north-star metric) plus one `#`-prefixed line per BASELINE.md config
(BASELINE.md:28-33):

  1. FastPitch text->mel only (`ttmel`)
  2. FastPitch2Wave end-to-end via HiFi-GAN + denoiser  <- headline
  3. Tacotron2Wave autoregressive decode -> wave
  4. Multispeaker FastPitch (speaker_id, pitch_mul/add) + Vocos backend
  5. Full frontend: Shakkala vowelizer -> batched synthesis (Arabic script)

Each number is audio-seconds-generated per wall-clock second (RTF),
steady-state (post-compile), best of 3 passes. The headline also reports
MFU (model FLOPs utilization = analytic FLOPs/s of the executed padded
shapes / chip peak FLOP/s, `tts_arabic_tpu/eval/flops.py`) so the RTF is
anchored to hardware capability rather than tunnel/host timing state.
Full details land in BENCH_DETAIL.json.

Weights are random (the reference publishes no checkpoints): the FastPitch
duration head is biased to a realistic ~6.5 frames/token and the Tacotron2
gate is biased to never fire so its decode runs a fixed, realistic 768
frames (~8.9 s) per utterance; compute cost is identical to trained weights.
"""
import json
import pathlib
import re
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent
T2_STEPS = 768          # fixed Tacotron2 decode length (~8.9 s audio)
T2_PROMPTS = 32         # autoregressive decode is sequential; subset is
                        # enough for a stable per-step number


def load_prompts():
    label = re.compile(r'"[^"]+"\s+"(?P<text>[^"]+)"')
    lines = []
    for line in (ROOT / "data" / "infer_text.txt").read_text().splitlines():
        m = label.match(line)
        lines.append(m.group("text") if m else line)
    return [l for l in lines if l.strip()]


def best_of(run, n=3):
    """(best wall seconds, last return value) over n passes."""
    best, out = float("inf"), None
    for _ in range(n):
        t0 = time.perf_counter()
        out = run()
        best = min(best, time.perf_counter() - t0)
    return best, out


def bias_duration(pipe):
    """Random init predicts ~0 frames/token; bias to ~6.5 (realistic Arabic
    speech rate at 86 fps) so benchmark shapes match production."""
    fc = pipe.model.variables["params"]["duration_predictor"]["fc"]
    fc["bias"] = fc["bias"] + 2.0


def main():
    from tts_arabic_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tts_arabic_tpu.infer import FastPitch2Wave, Tacotron2Wave
    from tts_arabic_tpu.eval import flops as F

    lines = load_prompts()
    sr = 22050
    hop = 256
    detail = {}

    def note(key, rtf, extra=""):
        detail[key] = round(rtf, 2)
        print(f"# {key}: {rtf:.1f}x realtime {extra}", file=sys.stderr)

    # ---- config 2 (headline): FastPitch + HiFi-GAN + denoiser e2e --------
    pipe = FastPitch2Wave(seed=0, arabic_in=False, compute_dtype=jnp.bfloat16)
    bias_duration(pipe)
    batch_size = 16

    def run_e2e():
        waves = pipe.tts(lines, denoise=0.005, batch_size=batch_size,
                         out_int16=True)
        return sum(len(w) for w in waves)

    t0 = time.perf_counter()
    total = run_e2e()  # warmup: compile every (text, mel) bucket signature
    warm = time.perf_counter() - t0
    elapsed, total = best_of(run_e2e)
    audio_sec = total / sr
    rtf = audio_sec / elapsed
    note("rtf_fastpitch_hifigan_e2e", rtf, f"({audio_sec:.0f}s audio, "
         f"warmup {warm:.0f}s)")

    # compute-only RTF + MFU: dispatch all programs, block, and count the
    # analytic FLOPs of the exact padded shapes the chip executed
    order = sorted(range(len(lines)), key=lambda i: -len(lines[i]))
    batches = [order[k: k + batch_size]
               for k in range(0, len(order), batch_size)]
    encs, handles = [], []
    t0 = time.perf_counter()
    for idxs in batches:
        encs.append(pipe._dispatch_encode([lines[i] for i in idxs], 1.0, 0,
                                          None, 1.0, 0.0, batch_size))
    for e in encs:
        handles.append(pipe._dispatch_wave(e, 1.0, 0.005, False, True))
    for h in handles:
        h[0].block_until_ready()
    compute_s = time.perf_counter() - t0
    cfg = pipe.model.config
    total_flops = 0
    for enc, h in zip(encs, handles):
        rows, n_tok = enc[0]["enc_out"].shape[:2]
        n_frames = h[0].shape[1] // hop  # mel bucket actually executed
        total_flops += rows * (F.fastpitch_encode_flops(cfg, n_tok)
                               + F.fastpitch_decode_flops(cfg, n_tok,
                                                          n_frames)
                               + F.hifigan_flops(n_frames))
    compute_rtf = audio_sec / compute_s
    peak = F.chip_peak_flops(dtype="bf16")
    mfu = total_flops / compute_s / peak if peak else None
    print(f"# mfu={mfu:.3f}" if mfu is not None else "# mfu=n/a (unknown chip)",
          f"({total_flops/1e12:.2f} TFLOP in {compute_s:.2f}s compute-only, "
          f"compute_rtf={compute_rtf:.0f}x, "
          f"peak={peak/1e12:.0f} TFLOP/s bf16)" if peak else "",
          file=sys.stderr)
    detail["mfu_e2e"] = round(mfu, 4) if mfu is not None else None
    detail["compute_only_rtf"] = round(compute_rtf, 2)
    detail["tflops_per_audio_sec"] = round(total_flops / 1e12 / audio_sec, 3)

    # ---- config 1: FastPitch text->mel only ------------------------------
    def run_mel():
        mels = pipe.model.ttmel(lines, batch_size=batch_size)
        return sum(m.shape[1] for m in mels)

    frames = run_mel()  # warmup
    elapsed, frames = best_of(run_mel)
    note("rtf_fastpitch_ttmel", frames * hop / sr / elapsed)

    # ---- config 3: Tacotron2Wave autoregressive --------------------------
    t2 = Tacotron2Wave(seed=0, arabic_in=False, compute_dtype=jnp.bfloat16)
    t2.model.decoder_max_step = T2_STEPS
    gate = t2.model.variables["params"]["gate_layer"]
    gate["bias"] = gate["bias"] - 10.0  # never stop early: fixed-len decode
    t2_lines = [lines[i] for i in
                sorted(range(len(lines)), key=lambda i: -len(lines[i]))
                [:T2_PROMPTS]]

    def run_t2():
        waves = t2.tts(t2_lines, denoise=0.005, batch_size=8,
                       postprocess_mel=False)
        return sum(len(w) for w in waves)

    total = run_t2()  # warmup
    elapsed, total = best_of(run_t2)
    t2_rtf = total / sr / elapsed
    note("rtf_tacotron2_e2e", t2_rtf,
         f"({T2_PROMPTS} prompts x {T2_STEPS}-frame decode, batch 8)")

    # ---- config 4: multispeaker FastPitch + Vocos backend ----------------
    from tts_arabic_tpu.models.fastpitch import FastPitchConfig
    ms = FastPitch2Wave(seed=0, arabic_in=False, compute_dtype=jnp.bfloat16,
                        vocoder_type="vocos",
                        config=FastPitchConfig(n_speakers=40))
    bias_duration(ms)

    def run_ms():
        waves = ms.tts(lines, denoise=0.003, batch_size=batch_size,
                       speaker_id=2, pitch_mul=1.05, pitch_add=8.0,
                       out_int16=True)
        return sum(len(w) for w in waves)

    total = run_ms()  # warmup
    elapsed, total = best_of(run_ms)
    note("rtf_fastpitch_ms_vocos", total / sr / elapsed,
         "(speaker_id=2, pitch_mul=1.05, pitch_add=8.0)")

    # ---- config 5: full frontend (vowelizer -> batched synthesis) --------
    label = re.compile(r'"[^"]+"\s+"(?P<text>[^"]+)"')
    arab = [m.group("text") for m in
            (label.match(l) for l in (ROOT / "data" / "test_arab.txt")
             .read_text().splitlines()) if m]
    fa = FastPitch2Wave(seed=0, arabic_in=True, compute_dtype=jnp.bfloat16)
    bias_duration(fa)

    def run_front():
        waves = fa.tts(arab, denoise=0.005, batch_size=batch_size,
                       vowelizer="shakkala", out_int16=True)
        return sum(len(w) for w in waves)

    total = run_front()  # warmup
    elapsed, total = best_of(run_front)
    note("rtf_full_frontend_vowelizer", total / sr / elapsed,
         f"({len(arab)} Arabic sentences, Shakkala in the loop)")

    detail["platform"] = jax.devices()[0].platform
    detail["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    (ROOT / "BENCH_DETAIL.json").write_text(json.dumps(detail, indent=1))

    result = {
        "metric": "rtf_fastpitch_hifigan_e2e",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 200.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
