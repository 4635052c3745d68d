"""Time-to-first-audio benchmark for both streaming pipelines.

    python tools/bench_stream.py [--model fastpitch|tacotron2|both]
                                 [--reps 7] [--chunk-frames N] [--ab]

Measures steady-state first-chunk latency (warmup excluded) on the
longest held-out prompt — the serving TTFA headline alongside RTF
(bench.py records the same quantity per round; this tool is for
interactive A/B work). --ab interleaves FastPitch speculation on/off
(parallel measurement of `STREAM_SPEC_FRAMES`' effect) to cancel
tunnel drift. Runs on whatever backend jax selects; numbers are only
meaningful on the real chip.
"""
import argparse
import pathlib
import re
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def load_longest_prompt():
    label = re.compile(r'"[^"]+"\s+"(?P<text>[^"]+)"')
    lines = []
    for line in (ROOT / "data" / "infer_text.txt").read_text().splitlines():
        m = label.match(line)
        t = m.group("text") if m else line
        if t.strip():
            lines.append(t)
    return max(lines, key=len)


def first_chunk_latency(make_gen, reps):
    list(make_gen())  # warmup: compile every window/segment signature
    lats = []
    for _ in range(reps):
        t0 = time.perf_counter()
        gen = make_gen()
        next(gen)
        lats.append((time.perf_counter() - t0) * 1e3)
        for _ in gen:  # drain so the next rep starts clean
            pass
    lats.sort()
    return lats


def report(tag, lats):
    print(f"{tag}: best {lats[0]:.0f} ms median {lats[len(lats) // 2]:.0f} "
          f"ms  {[round(x) for x in lats]}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="both",
                   choices=["fastpitch", "tacotron2", "both"])
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--chunk-frames", type=int, default=None)
    p.add_argument("--ab", action="store_true",
                   help="interleaved FastPitch speculation on/off A/B")
    a = p.parse_args(argv)

    from tts_arabic_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    text = load_longest_prompt()

    if a.model in ("fastpitch", "both"):
        from tts_arabic_tpu.infer import FastPitch2Wave
        from tts_arabic_tpu.infer import pipeline as pl

        pipe = FastPitch2Wave(seed=0, arabic_in=False,
                              compute_dtype=jnp.bfloat16)
        fc = pipe.model.variables["params"]["duration_predictor"]["fc"]
        fc["bias"] = fc["bias"] + 2.0
        cf = a.chunk_frames or 128
        mk = lambda: pipe.stream(text, chunk_frames=cf, denoise=0.005)
        if a.ab:
            for tag, spec in (("fp spec-on ", 2048), ("fp spec-off", 1),
                              ("fp spec-on ", 2048), ("fp spec-off", 1)):
                pl.STREAM_SPEC_FRAMES = spec
                report(tag, first_chunk_latency(mk, a.reps))
        else:
            report("fastpitch first-chunk",
                   first_chunk_latency(mk, a.reps))

    if a.model in ("tacotron2", "both"):
        from tts_arabic_tpu.infer import Tacotron2Wave

        t2 = Tacotron2Wave(seed=0, arabic_in=False,
                           compute_dtype=jnp.bfloat16)
        t2.model.decoder_max_step = 768
        g = t2.model.variables["params"]["gate_layer"]
        g["bias"] = g["bias"] - 10.0  # fixed-length decode (random init)
        cf = a.chunk_frames or 96
        report("tacotron2 first-chunk", first_chunk_latency(
            lambda: t2.stream(text, chunk_frames=cf, denoise=0.005),
            a.reps))


if __name__ == "__main__":
    main()
