"""Shared timing harness for single-chip microbenches over the axon tunnel.

Every dispatch+fetch over the tunnel costs a round trip (RTT, measured
15-60 ms — larger than many of the programs being timed), so single-call
wall times measure the tunnel, not the chip. `bench_exec` separates them
with a two-point fit:

    T_1 = RTT + exec        (one dispatch, block, 1-element fetch)
    T_k = RTT + k * exec    (k async dispatches, ONE block + fetch)
    exec = (T_k - T_1) / (k - 1)

Both points are best-of-n; the final single-element fetch (device-side
slice first!) defeats axon's block_until_ready early-return on replayed
dispatches, and fetching the WHOLE output would re-introduce the
~40 MB/s transfer into the timed region (docs/PERF.md timing caveats).
"""
import sys
import time

import jax

__all__ = ["bench_exec"]


def _fetch_one(out):
    float(jax.tree.leaves(out)[0].ravel()[0])


def bench_exec(f, args, n=5, k=32):
    """Returns (exec_s, rtt_s, t1_s) for one call of f(*args).

    k must be large enough that k*exec dwarfs the RTT's own jitter
    (observed: ~100 ms swings under host load) — with k=8 the difference
    of two noisy minima produced exec estimates ABOVE the chip's spec
    peak. k=32 puts >=100 ms of real work behind the fit for any
    millisecond-class program; if the two points still cross (tk <= t1),
    the estimate falls back to tk/k (upper bound) rather than reporting
    fiction. Run on a QUIET host: XLA dispatch is host-side work, and a
    saturated host corrupts both points.

    Pass k=None to pick k from a compiled call's own wall time (long
    programs already dwarf the RTT, so a small k keeps total bench time
    bounded without hurting the fit).
    """
    out = f(*args)
    jax.block_until_ready(out)
    _fetch_one(out)  # warm the fetch path too
    if k is None:
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        warm = time.perf_counter() - t0
        k = 4 if warm > 0.4 else (8 if warm > 0.15 else 32)

    def point(calls):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(calls):
                # keep only the newest reference: holding all k outputs
                # OOMs HBM for large-output programs (k x hundreds of MB);
                # dropped buffers free as the device queue drains
                out = f(*args)
            jax.block_until_ready(out)
            _fetch_one(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = point(1)
    tk = point(k)
    if tk <= t1:  # RTT jitter swamped the signal: report the upper bound
        print(f"# chipbench WARNING: two-point fit degenerate "
              f"(t1={t1:.4f}s >= t{k}={tk:.4f}s): exec estimate "
              f"{tk / k:.4f}s is an RTT-jitter UPPER BOUND, not a clean "
              f"fit", file=sys.stderr)
        return tk / k, 0.0, t1
    exec_s = (tk - t1) / (k - 1)
    rtt_s = max(t1 - exec_s, 0.0)
    return exec_s, rtt_s, t1
