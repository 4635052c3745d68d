"""Gate-controlled synthetic Tacotron2 checkpoints for benchmarking.

With random weights the decode gate never fires (logits sit far below the
threshold), so a naive benchmark decodes every sample to the fixed step cap
and never exercises EOS stop, per-sample ragged lengths, or the truncation/
collection paths a real checkpoint takes (reference gate semantics:
`tacotron2_ms.py:278-332`; torchaudio `_Decoder.infer` early stopping).

`install_gate_control` rewires a randomly-initialized model so each SAMPLE's
gate fires at a deterministic step near a chosen target while the *control*
(gate) channel provably does not perturb the mel/attention trajectories:

1. the speaker embedding's influence on every decode DYNAMICS input is
   zeroed (its rows of `memory_layer`, the attention/decoder LSTM input
   weights, and `linear_projection`) EXCEPT one designated DITHER channel
   `j_dyn` (whose gate-kernel entry is zeroed instead). Two orthogonal
   per-sample knobs remain:
     - gate channel `j_gate`: reaches ONLY the gate logit (constant offset
       `delta`); the realized stop step is exactly monotone in `delta`;
     - dither channel `j_dyn`: reaches ONLY the dynamics, deterministically
       re-rolling the whole gate-signal trajectory without touching the
       gate weights.
2. For a fixed dither, the live logit is g_i(t) + delta_i, so the reachable
   stop steps are exactly the strict prefix-max RECORDS of g_i(t). Measured
   on the bench config (TPU v5e, 768-step cap): a single trajectory has
   median 2 records in [86, 768) and some samples have none — more
   bisection iterations cannot converge to a target no record is near. The
   dither channel multiplies the achievable set: each candidate dither is
   probed once (batched no-early-stop decode), its records are computed
   analytically, and each sample keeps the dither whose record lands
   nearest its target.
3. the gate kernel is scaled (by a power of two, so bf16 weight scaling is
   exact) to give the wander a usable span, and biased so delta = 0 never
   fires; per sample, delta_i is then found by PARALLEL BISECTION against
   the LIVE jitted decode (one batched decode evaluates all samples per
   iteration). No recorded trajectory is replayed for the final answer and
   no numeric margin is assumed: the oracle is the exact program the
   benchmark re-runs, so the result is robust to any compute dtype /
   backend numerics by construction.

The full calibration is cached on disk keyed by (texts, targets, model
seed fingerprint, backend, dtype, step cap, code version); a cache hit
replays the stored rewiring and validates it with ONE live decode (the
same determinism double-decode the bench re-asserts), so repeated bench
runs skip the probe/bisection decodes entirely.

`install_gate_control` is idempotent: it snapshots the pristine parameters
it mutates on first install and restores them before re-deriving, so a
second install on the same model (e.g. bench's EOS-postprocess row) is
exact, not incidentally-working.

Asserted by `tests/test_gate_control.py`; re-verified on every bench run by
an on-chip determinism double-decode.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import pathlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["install_gate_control"]

# frames/token a trained model realistically emits (reference corpus mean)
_FRAMES_PER_TOKEN = 6.5

# bump to invalidate stale disk caches when the algorithm changes
_CACHE_VERSION = 4

_SNAP_ATTR = "_gate_control_pristine"

# per-sample dynamics dithers probed per calibration; 0.0 first (the
# undithered trajectory), then natural-scale magnitudes of both signs —
# the j_dyn rows keep their pristine random-init values, so a unit dither
# injects at the model's own activation scale. Each candidate is one
# cached probe decode; 13 candidates give each sample 13 independent
# record sets to choose a near-target stop from (r5 chip measurement:
# 7 candidates left off-target at 11/32, dominated by sparse records).
_DEFAULT_DITHERS = (0.0, 0.7, -0.7, 1.2, -1.2, 2.0, -2.0, 3.5, -3.5,
                    6.0, -6.0, 10.0, -10.0)


def _zero_rows(arr, lo: int, hi: int, keep: Optional[int] = None):
    """Zero rows [lo, hi); optionally preserve pristine row lo+keep."""
    a = np.asarray(arr).copy()
    saved = a[lo + keep].copy() if keep is not None else None
    a[lo:hi] = 0.0
    if keep is not None:
        a[lo + keep] = saved
    return jnp.asarray(a)


def _records(sig_row: np.ndarray, floor: int, cap: int):
    """Strict prefix-max record steps of one gate-signal trajectory in
    [floor, cap): exactly the steps a constant-offset controller can stop
    at (stop = first t with sig(t) > threshold)."""
    prefmax = np.maximum.accumulate(sig_row)
    t = np.arange(1, len(sig_row))
    rec = t[sig_row[1:] > prefmax[:-1]]
    return rec[(rec >= floor) & (rec < cap)]


def _params_fingerprint(snapshot) -> str:
    """Cheap, stable fingerprint of the pristine model weights (cache key
    input): hashes the snapshot leaves install_gate_control mutates."""
    h = hashlib.sha1()
    for key in sorted(snapshot, key=str):
        h.update(np.ascontiguousarray(
            np.asarray(snapshot[key], np.float32)).tobytes())
    return h.hexdigest()[:16]


def _cache_dir() -> pathlib.Path:
    d = os.environ.get("TTS_ARABIC_GATE_CACHE")
    if d:
        return pathlib.Path(d)
    return pathlib.Path(__file__).resolve().parents[2] / ".gate_cache"


class _Rewire:
    """The mutation set install_gate_control applies; snapshot/restore makes
    the install idempotent."""

    LEAVES = (("memory_layer", "kernel"), ("attention_rnn", "wi"),
              ("decoder_rnn", "wi"), ("linear_projection", "kernel"),
              ("speaker_embedding", "embedding"), ("gate_layer", "kernel"),
              ("gate_layer", "bias"))

    @classmethod
    def snapshot(cls, pipe):
        if getattr(pipe, _SNAP_ATTR, None) is None:
            p = pipe.model.variables["params"]
            setattr(pipe, _SNAP_ATTR,
                    {k: np.asarray(p[k[0]][k[1]]).copy()
                     for k in cls.LEAVES})

    @classmethod
    def restore(cls, pipe):
        snap = getattr(pipe, _SNAP_ATTR, None)
        if snap is not None:
            p = pipe.model.variables["params"]
            for (mod, leaf), v in snap.items():
                p[mod][leaf] = jnp.asarray(v)


def install_gate_control(
    pipe,
    texts: Sequence[str],
    targets: Optional[Sequence[int]] = None,
    *,
    postprocess_mel: bool = False,
    target_span: float = 16.0,
    base_gap: float = 4.0,
    t_min: int = 16,
    min_len: Optional[int] = None,
    speaker_base: int = 0,
    search_iters: int = 24,
    dither_candidates: Sequence[float] = _DEFAULT_DITHERS,
    use_cache: bool = True,
):
    """Rewire `pipe` (a `Tacotron2Wave`) for controlled gate stops.

    Mutates `pipe.model.variables` in place (idempotent: re-installing
    restores the pristine weights first) and runs its calibration decodes
    of `texts`, prepared exactly as `pipe.tts(texts, batch_size=len(texts),
    postprocess_mel=...)` prepares them — same token insertion, same
    length-sort, same dropout rng — so the searched-over decodes are the
    ones the benchmark re-runs.

    `min_len` floors both the auto targets and the accepted gate stops
    (pass 86 ≈ 1 s of audio to keep degenerate utterances out of RTF
    accounting); defaults to `t_min`.

    Returns `(speakers, lengths, report)`:
      - `speakers`: int array; pass as `tts(..., speaker_id=speakers)`
        aligned with `texts` (speaker i = speaker_base + i);
      - `lengths`: the decode length each sample realizes (`mel_lens`
        semantics: stop step + 1; `decoder_max_step` where the gate never
        fires) — measured from the final live decode, deterministic for
        repeated identical calls;
      - `report`: per-sample targets / realized lengths / off-target and
        cap-fallback counts / chosen dithers / cache status.

    The model config must have `num_speakers >= speaker_base + len(texts)`.
    """
    from ..models.tacotron2 import Tacotron2

    m = pipe.model
    cfg = m.config
    B = len(texts)
    if cfg.num_speakers < speaker_base + B:
        raise ValueError(
            f"need num_speakers >= {speaker_base + B}, "
            f"got {cfg.num_speakers}")
    max_steps = m.decoder_max_step
    floor = int(min_len if min_len is not None else t_min)
    if targets is None:
        tok_lens = [len(m.tokenize(t)) for t in texts]
        targets = np.clip((_FRAMES_PER_TOKEN * np.asarray(tok_lens)).astype(
            int), max(t_min + 8, floor), max_steps - 16)
    targets = np.asarray(targets, int)

    _Rewire.snapshot(pipe)
    _Rewire.restore(pipe)
    p = m.variables["params"]
    d_enc, d_spk = cfg.encoder_embedding_dim, cfg.speaker_embedding_dim
    mem = d_enc + d_spk
    drnn = cfg.decoder_rnn_dim

    # channel picks (before any mutation): gate channel = largest pristine
    # |gate-kernel| speaker entry; dither channel = second-largest
    gk0 = np.asarray(p["gate_layer"]["kernel"], np.float32)[:, 0]
    w_spk0 = np.abs(gk0[drnn + d_enc: drnn + mem])
    order = np.argsort(-w_spk0)
    j_gate, j_dyn = int(order[0]), int(order[1])

    # 1. cut every speaker->dynamics path EXCEPT the dither channel j_dyn
    # (whose pristine rows stay, giving it natural activation scale), and
    # cut j_dyn's direct gate path so the gate-channel offset stays the
    # only delta-dependent term in the logit
    p["memory_layer"]["kernel"] = _zero_rows(
        p["memory_layer"]["kernel"], d_enc, mem, keep=j_dyn)
    p["attention_rnn"]["wi"] = _zero_rows(
        p["attention_rnn"]["wi"], cfg.prenet_dim + d_enc,
        cfg.prenet_dim + mem, keep=j_dyn)
    p["decoder_rnn"]["wi"] = _zero_rows(
        p["decoder_rnn"]["wi"], cfg.attention_rnn_dim + d_enc,
        cfg.attention_rnn_dim + mem, keep=j_dyn)
    p["linear_projection"]["kernel"] = _zero_rows(
        p["linear_projection"]["kernel"], drnn + d_enc, drnn + mem,
        keep=j_dyn)
    gk = np.asarray(p["gate_layer"]["kernel"], np.float32).copy()
    gk[drnn + d_enc + j_dyn, 0] = 0.0
    p["gate_layer"]["kernel"] = jnp.asarray(gk)
    p["speaker_embedding"]["embedding"] = jnp.zeros_like(
        p["speaker_embedding"]["embedding"])

    tokens_list, _ = m._prepare_tokens(list(texts), None, postprocess_mel)
    spk = np.arange(speaker_base, speaker_base + B)

    def live_lengths():
        out, _, inverse = m._dispatch_infer(tokens_list, spk, pad_to=B)
        return np.asarray(out["mel_lens"])[inverse][:B]

    def set_embedding(dithers, deltas, w_b):
        emb = np.zeros((cfg.num_speakers, d_spk), np.float32)
        emb[speaker_base:speaker_base + B, j_dyn] = dithers
        emb[speaker_base:speaker_base + B, j_gate] = deltas / w_b
        p["speaker_embedding"]["embedding"] = jnp.asarray(emb)

    # ---- disk cache: replay a previous calibration if it still validates
    dev = jax.devices()[0]
    key_payload = json.dumps({
        "v": _CACHE_VERSION, "texts": list(texts),
        "targets": targets.tolist(), "pp": postprocess_mel,
        "span": target_span, "t_min": t_min, "floor": floor,
        "base": speaker_base, "iters": search_iters,
        "dithers": list(dither_candidates), "max_steps": max_steps,
        "params": _params_fingerprint(getattr(pipe, _SNAP_ATTR)),
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", "?"),
        "dtype": str(getattr(pipe, "compute_dtype", "?")),
    }, sort_keys=True)
    cache_file = _cache_dir() / (
        hashlib.sha1(key_payload.encode()).hexdigest()[:24] + ".json")
    if use_cache and cache_file.exists():
        try:
            c = json.loads(cache_file.read_text())
        except Exception:
            c = None
        if c is not None:
            gk2 = gk.copy()
            gk2[:, 0] *= c["amp"]
            p["gate_layer"]["kernel"] = jnp.asarray(gk2)
            p["gate_layer"]["bias"] = jnp.asarray([c["bias"]])
            set_embedding(np.asarray(c["dithers"]),
                          np.asarray(c["deltas"]), c["w_b"])
            realized = live_lengths()
            if realized.tolist() == c["lengths"]:
                report = dict(c["report"])
                report["cache"] = "hit"
                return spk, np.asarray(c["lengths"]), report
            # stale (different backend numerics): fall through, recalibrate

    # 2a. probe decodes at natural gate scale with a no-early-stop config
    # variant, one per dither candidate: the gate output feeds back into
    # NOTHING (it only stops the loop), so scaling/biasing the gate layer
    # afterwards transforms these same trajectories exactly. Records of
    # each trajectory are the achievable stop set for that dither.
    no_stop = Tacotron2(dataclasses.replace(cfg,
                                            decoder_early_stopping=False))
    live_model, live_jit = m.model, m._infer_jit
    m.model = no_stop
    # jit over a UNIQUE closure, never the bound method: bound methods of
    # the same object compare/hash equal, so jax.jit(m._infer_fn) wrappers
    # SHARE a trace cache — a second install's probe would silently reuse
    # an early-stopping trace for a matching shape and return truncated
    # gate buffers (observed: reinstall probe std == 0.0)
    fn = m._infer_fn
    m._infer_jit = jax.jit(lambda *a, **k: fn(*a, **k),
                           static_argnames=("max_steps",))
    b0 = float(np.asarray(p["gate_layer"]["bias"], np.float32)[0])
    sigs = []
    try:
        for d in dither_candidates:
            set_embedding(np.full(B, d), np.zeros(B), 1.0)
            out, _, inverse = m._dispatch_infer(tokens_list, spk, pad_to=B)
            g = np.asarray(out["gates"], np.float32)[inverse][:B]
            sigs.append(g - b0)
    finally:
        m.model, m._infer_jit = live_model, live_jit
    sigs = np.stack(sigs)  # [D, B, T]

    # per sample: pick the dither whose record set lands nearest target
    chosen = np.zeros(B, int)
    predicted_gap = np.full(B, np.inf)
    for i in range(B):
        for k in range(len(dither_candidates)):
            rec = _records(sigs[k, i], floor, max_steps)
            if len(rec):
                gap_k = np.abs(rec - targets[i]).min()
                if gap_k < predicted_gap[i]:
                    predicted_gap[i] = gap_k
                    chosen[i] = k
    dithers = np.asarray([dither_candidates[k] for k in chosen], np.float32)
    sig = sigs[chosen, np.arange(B)]  # each sample's chosen trajectory

    # span from POST-BURN wander: the signal converges to a fixed point
    # after an onset transient; the usable "texture" that makes distinct
    # stop steps reachable is the per-step wander around it, so that is
    # what gets scaled to target_span.
    std = max(float(sig[:, t_min:].std()), 1e-9)
    # power-of-two scale -> exact bf16 weight scaling
    amp = float(2.0 ** np.round(np.log2(target_span / std)))
    gk_amp = gk.copy()
    gk_amp[:, 0] *= amp
    p["gate_layer"]["kernel"] = jnp.asarray(gk_amp)

    # injection strength of the gate channel after scaling
    w_b = float(gk_amp[drnn + d_enc + j_gate, 0])

    # 2b. never-firing base bias on the LIVE program: the probe trajectory
    # only estimates the signal max (a different jit program need not
    # replay it exactly), so back off until delta = 0 decodes to the step
    # cap for every sample (with its chosen dither installed).
    gap = base_gap
    for attempt in range(4):
        p["gate_layer"]["bias"] = jnp.asarray([-amp * float(sig.max()) - gap])
        set_embedding(dithers, np.zeros(B), w_b)
        if int(live_lengths().min()) >= max_steps:
            break
        gap *= 4.0
    else:
        raise RuntimeError("gate_control: could not find a never-firing "
                           "base bias")
    bias = float(np.asarray(p["gate_layer"]["bias"], np.float32)[0])

    # 3. per-sample parallel bisection of delta against the live decode.
    # Monotonicity is exact per fixed dither (the trajectory is
    # delta-independent), so lo/hi brackets never lie; the realized length
    # is a step function of delta and we keep the evaluation closest to
    # target among acceptable stops (fired in [floor, cap)).
    lo = np.zeros(B)                       # realized > target (never fires)
    hi = np.full(B, np.nan)                # realized <= target once known
    trial = np.full(B, gap + 2.0 * target_span)
    best_delta = np.zeros(B)
    best_len = np.full(B, max_steps, np.int64)
    for _ in range(search_iters):
        set_embedding(dithers, trial, w_b)
        realized = live_lengths()
        # prefer ANY acceptable gate stop over the never-fired cap (the cap
        # exercises none of the EOS paths); among stops, closest-to-target
        fired = (realized < max_steps) & (realized >= floor)
        better = fired & ((best_len >= max_steps)
                          | (np.abs(realized - targets)
                             < np.abs(best_len - targets)))
        best_delta[better] = trial[better]
        best_len[better] = realized[better]
        high = realized > targets          # needs more delta
        lo = np.where(high, trial, lo)
        hi = np.where(high, hi, np.where(np.isnan(hi), trial,
                                         np.minimum(hi, trial)))
        trial = np.where(np.isnan(hi), trial * 4.0, 0.5 * (lo + hi))

    # the step cap itself is a REAL decode outcome (reference
    # decoder_max_step truncation, tacotron2_ms.py:318-323): when no
    # reachable record is closer to the target than the cap — typical for
    # long prompts whose ~6.5 f/t target saturates near the cap — prefer
    # the never-fire delta (= 0) so the sample decodes to the cap instead
    # of a distant forced stop (r5 chip measurement: this alone removed 6
    # of 11 off-target misses)
    cap_closer = (np.abs(np.int64(max_steps) - targets)
                  < np.abs(best_len - targets))
    best_delta = np.where(cap_closer, 0.0, best_delta)
    best_len = np.where(cap_closer, max_steps, best_len)

    set_embedding(dithers, best_delta, w_b)
    lengths = live_lengths()               # the final installed behavior
    off_target = int((np.abs(lengths - targets) > 0.25 * targets).sum())
    at_cap = lengths >= max_steps
    within = np.abs(lengths - targets) <= 0.25 * targets
    # never calibrated at all (only cap reachable AND cap off-target):
    # distinct from a tolerable near-target miss — ADVICE r4
    cap_fallback = int((at_cap & ~within).sum())

    report = {
        "targets": targets.tolist(),
        "realized_lengths": lengths.tolist(),
        "off_target": off_target,
        "n_fired": int((~at_cap).sum()),
        "cap_preferred": int((at_cap & within).sum()),
        "cap_fallback": cap_fallback,
        "predicted_gap_rel": np.round(
            np.where(np.isfinite(predicted_gap),
                     predicted_gap / targets, -1.0), 3).tolist(),
        "amplify": amp,
        "gap": gap,
        "gate_channel": j_gate,
        "dither_channel": j_dyn,
        "dithers": dithers.tolist(),
        "floor": floor,
        "cache": "miss",
    }
    if use_cache:
        try:
            cache_file.parent.mkdir(parents=True, exist_ok=True)
            cache_file.write_text(json.dumps({
                "amp": amp, "bias": bias, "w_b": w_b,
                "dithers": dithers.tolist(),
                "deltas": best_delta.tolist(),
                "lengths": lengths.tolist(),
                "report": report, "key": json.loads(key_payload),
            }, indent=1))
        except OSError:
            pass
    return spk, lengths, report
