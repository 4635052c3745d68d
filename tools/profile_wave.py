"""Profile the fused wave jit (decoder FFT + HiFi-GAN + denoiser) on TPU.

Captures a ``jax.profiler`` trace of steady-state synthesis and prints a
per-op device-time table (top HLO fusions by total self time), the basis
for the vocoder optimization pass (SURVEY.md section 7.2 step 8).

Usage:  python tools/profile_wave.py [--out /tmp/wave_trace] [--batch 16]

The table is aggregated from the TensorBoard trace-viewer JSON the
profiler emits; op names carry XLA fusion labels so each row can be
attributed to a model stage (conv_pre / up_i / res_i_j / denoiser STFT /
FFT decoder layers).
"""
import argparse
import collections
import gzip
import json
import pathlib
import re
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def load_prompts():
    label = re.compile(r'"[^"]+"\s+"(?P<text>[^"]+)"')
    lines = []
    for line in (ROOT / "data" / "infer_text.txt").read_text().splitlines():
        m = label.match(line)
        lines.append(m.group("text") if m else line)
    return [l for l in lines if l.strip()]


def aggregate_trace(trace_dir: pathlib.Path):
    """Sum device-track op durations (us) by op name across the trace."""
    files = sorted(trace_dir.glob("plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    device_pids = {e["pid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in (e["args"].get("name") or "")}
    # thread names on the device track distinguish the XLA op stream from
    # the enclosing module event ("XLA Modules") and the "Steps" track
    # (one numerically-named event spanning each whole step), either of
    # which would double count
    module_tids = {(e["pid"], e["tid"]) for e in ev
                   if e.get("ph") == "M" and e.get("name") == "thread_name"
                   and any(k in (e["args"].get("name") or "").lower()
                           for k in ("module", "step"))}
    per_op = collections.defaultdict(float)
    long_names = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        if (e["pid"], e.get("tid")) in module_tids or \
                e["name"].startswith("jit_"):
            continue
        per_op[e["name"]] += e.get("dur", 0.0)
        total += e.get("dur", 0.0)
        args = e.get("args") or {}
        ln = args.get("long_name") or args.get("hlo_op") or ""
        if ln and e["name"] not in long_names:
            long_names[e["name"]] = ln
    return per_op, long_names, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/wave_trace")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from tts_arabic_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tts_arabic_tpu.infer import FastPitch2Wave

    lines = load_prompts()
    pipe = FastPitch2Wave(seed=0, arabic_in=False,
                          compute_dtype=jnp.bfloat16)
    fc = pipe.model.variables["params"]["duration_predictor"]["fc"]
    fc["bias"] = fc["bias"] + 2.0  # realistic ~6.5 frames/token

    order = sorted(range(len(lines)), key=lambda i: -len(lines[i]))
    batches = [order[k: k + args.batch]
               for k in range(0, len(order), args.batch)]

    def run():
        encs = [pipe._dispatch_encode([lines[i] for i in idxs], 1.0, 0,
                                      None, 1.0, 0.0, args.batch)
                for idxs in batches]
        handles = [pipe._dispatch_wave(e, 1.0, 0.005, False, True)
                   for e in encs]
        for h in handles:
            h[0].block_until_ready()

    run()  # warmup/compile
    t0 = time.perf_counter()
    run()
    steady = time.perf_counter() - t0

    out = pathlib.Path(args.out)
    with jax.profiler.trace(str(out)):
        run()

    per_op, long_names, total = aggregate_trace(out)
    print(f"steady-state wall: {steady*1e3:.1f} ms for "
          f"{len(batches)} batches of {args.batch}")
    print(f"device op time total: {total/1e3:.2f} ms\n")
    print(f"{'%':>6} {'ms':>9}  op")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    for name, dur in rows[: args.top]:
        ln = long_names.get(name, "")
        if ln and ln != name:
            ln = "  | " + ln[:140]
        print(f"{100*dur/total:6.2f} {dur/1e3:9.3f}  {name}{ln}")
    rest = sum(d for _, d in rows[args.top:])
    print(f"{100*rest/total:6.2f} {rest/1e3:9.3f}  (other "
          f"{max(0, len(rows)-args.top)} ops)")


if __name__ == "__main__":
    main()
