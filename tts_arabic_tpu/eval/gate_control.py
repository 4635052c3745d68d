"""Gate-controlled synthetic Tacotron2 checkpoints for benchmarking.

With random weights the decode gate never fires (logits sit far below the
threshold), so a naive benchmark decodes every sample to the fixed step cap
and never exercises EOS stop, per-sample ragged lengths, or the truncation/
collection paths a real checkpoint takes (reference gate semantics:
`tacotron2_ms.py:278-332`; torchaudio `_Decoder.infer` early stopping).

`install_gate_control` rewires a randomly-initialized model so each SAMPLE's
gate fires at a deterministic step near a chosen target while provably not
perturbing the mel/attention trajectories:

1. the speaker embedding's influence on every decode DYNAMICS input is
   zeroed (its rows of `memory_layer`, the attention/decoder LSTM input
   weights, and `linear_projection`), leaving exactly one causal path:
   speaker slice of the attention context -> gate logit. The live logit is
   therefore g_i(t) + delta_i * sigma_i(t), where g_i(t) is a
   delta-INDEPENDENT trajectory and sigma_i(t) = sum_k a_ik(t) > 0 — so the
   realized stop step is exactly monotone (non-increasing) in delta_i;
2. the gate kernel is scaled (by a power of two, so bf16 weight scaling is
   exact) so the prenet-dropout wander of g_i(t) has a usable span, and
   biased from a probe decode so delta = 0 never fires;
3. per sample, delta_i — injected through a single speaker-embedding
   channel — is found by PARALLEL BISECTION against the LIVE jitted decode
   (one batched decode evaluates all samples per iteration). No recorded
   trajectory is replayed and no numeric margin is assumed: the oracle is
   the exact program the benchmark re-runs, so the result is robust to any
   compute dtype / backend numerics by construction. (An earlier design
   solved delta analytically against recorded calibration trajectories;
   on-chip bf16 decode divergence decorrelated the replay from the
   recording and only 5/32 samples realized their predicted step.)

Asserted by `tests/test_gate_control.py`; re-verified on every bench run by
an on-chip determinism double-decode.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["install_gate_control"]

# frames/token a trained model realistically emits (reference corpus mean)
_FRAMES_PER_TOKEN = 6.5


def _zero_rows(arr, lo: int, hi: int):
    a = np.asarray(arr).copy()
    a[lo:hi] = 0.0
    return jnp.asarray(a)


def install_gate_control(
    pipe,
    texts: Sequence[str],
    targets: Optional[Sequence[int]] = None,
    *,
    postprocess_mel: bool = False,
    target_span: float = 16.0,
    base_gap: float = 4.0,
    t_min: int = 16,
    speaker_base: int = 0,
    search_iters: int = 22,
):
    """Rewire `pipe` (a `Tacotron2Wave`) for controlled gate stops.

    Mutates `pipe.model.variables` in place (call ONCE per model — the
    rewiring is not idempotent) and runs its calibration decodes of
    `texts`, prepared exactly as `pipe.tts(texts, batch_size=len(texts),
    postprocess_mel=...)` prepares them — same token insertion, same
    length-sort, same dropout rng — so the searched-over decodes are the
    ones the benchmark re-runs.

    Returns `(speakers, lengths, report)`:
      - `speakers`: int array; pass as `tts(..., speaker_id=speakers)`
        aligned with `texts` (speaker i = speaker_base + i);
      - `lengths`: the decode length each sample realizes (`mel_lens`
        semantics: stop step + 1; `decoder_max_step` where the gate never
        fires) — measured from the final live decode, deterministic for
        repeated identical calls;
      - `report`: per-sample targets / realized lengths / off-target count.

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
    if targets is None:
        tok_lens = [len(m.tokenize(t)) for t in texts]
        targets = np.clip((_FRAMES_PER_TOKEN * np.asarray(tok_lens)).astype(
            int), t_min + 8, max_steps - 16)
    targets = np.asarray(targets, int)

    p = m.variables["params"]
    d_enc, d_spk = cfg.encoder_embedding_dim, cfg.speaker_embedding_dim
    mem = d_enc + d_spk
    # 1. cut every speaker->dynamics path
    p["memory_layer"]["kernel"] = _zero_rows(
        p["memory_layer"]["kernel"], d_enc, mem)
    p["attention_rnn"]["wi"] = _zero_rows(
        p["attention_rnn"]["wi"], cfg.prenet_dim + d_enc,
        cfg.prenet_dim + mem)
    p["decoder_rnn"]["wi"] = _zero_rows(
        p["decoder_rnn"]["wi"], cfg.attention_rnn_dim + d_enc,
        cfg.attention_rnn_dim + mem)
    drnn = cfg.decoder_rnn_dim
    p["linear_projection"]["kernel"] = _zero_rows(
        p["linear_projection"]["kernel"], drnn + d_enc, drnn + mem)
    p["speaker_embedding"]["embedding"] = jnp.zeros_like(
        p["speaker_embedding"]["embedding"])

    tokens_list, _ = m._prepare_tokens(list(texts), None, postprocess_mel)
    spk = np.arange(speaker_base, speaker_base + B)

    # 2a. probe decode at natural gate scale with a no-early-stop config
    # variant: measure signal statistics only. The gate output feeds back
    # into NOTHING (it only stops the loop), so scaling/biasing the gate
    # layer afterwards transforms this same trajectory exactly.
    no_stop = Tacotron2(dataclasses.replace(cfg,
                                            decoder_early_stopping=False))
    live_model, live_jit = m.model, m._infer_jit
    m.model = no_stop
    m._infer_jit = jax.jit(m._infer_fn, static_argnames=("max_steps",))
    try:
        out, _, _ = m._dispatch_infer(tokens_list, spk, pad_to=B)
    finally:
        m.model, m._infer_jit = live_model, live_jit
    g_raw = np.asarray(out["gates"], np.float32)
    b0 = float(np.asarray(p["gate_layer"]["bias"], np.float32)[0])
    sig = g_raw - b0                           # the w.x part
    # span from POST-BURN wander: the signal converges to a fixed point
    # after an onset transient; the usable "texture" that makes distinct
    # stop steps reachable is the per-step prenet-dropout wander around
    # it, so that is what gets scaled to target_span.
    std = max(float(sig[:, t_min:].std()), 1e-9)
    # power-of-two scale -> exact bf16 weight scaling
    amp = float(2.0 ** np.round(np.log2(target_span / std)))
    p["gate_layer"]["kernel"] = p["gate_layer"]["kernel"] * amp

    # 2b. never-firing base bias on the LIVE program: the probe trajectory
    # only estimates the signal max (a different jit program / dtype path
    # need not replay it exactly), so back off until delta = 0 decodes to
    # the step cap for every sample.
    def live_lengths():
        out, _, inverse = m._dispatch_infer(tokens_list, spk, pad_to=B)
        return np.asarray(out["mel_lens"])[inverse][:B]

    gap = base_gap
    for attempt in range(4):
        p["gate_layer"]["bias"] = jnp.asarray([-amp * float(sig.max()) - gap])
        if int(live_lengths().min()) >= max_steps:
            break
        gap *= 4.0
    else:
        raise RuntimeError("gate_control: could not find a never-firing "
                           "base bias")

    # injection channel: the speaker-slice entry of the (scaled) gate
    # kernel with the largest magnitude; logit contribution of embedding
    # value v is v * w_b * sigma(t) — we search in "delta" units
    # (delta = v * w_b), so the channel's sign is irrelevant
    gk = np.asarray(p["gate_layer"]["kernel"], np.float32)[:, 0]
    w_spk = gk[drnn + d_enc: drnn + mem]
    j = int(np.abs(w_spk).argmax())
    w_b = float(w_spk[j])

    # 3. per-sample parallel bisection of delta against the live decode.
    # Monotonicity is exact (step 1: the trajectory is delta-independent,
    # sigma > 0), so lo/hi brackets never lie; the realized length is a
    # step function of delta and we keep the evaluation closest to target.
    emb = np.zeros((cfg.num_speakers, d_spk), np.float32)
    lo = np.zeros(B)                       # realized > target (never fires)
    hi = np.full(B, np.nan)                # realized <= target once known
    trial = np.full(B, gap + 2.0 * target_span)
    best_delta = np.zeros(B)
    best_len = np.full(B, max_steps, np.int64)
    for _ in range(search_iters):
        emb[speaker_base:speaker_base + B, j] = trial / w_b
        p["speaker_embedding"]["embedding"] = jnp.asarray(emb)
        realized = live_lengths()
        # prefer ANY gate stop over the never-fired cap (the cap exercises
        # none of the EOS paths); among stops, prefer closest-to-target
        fired = (realized < max_steps) & (realized > t_min)
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

    emb[speaker_base:speaker_base + B, j] = best_delta / w_b
    p["speaker_embedding"]["embedding"] = jnp.asarray(emb)
    lengths = live_lengths()               # the final installed behavior
    off_target = int((np.abs(lengths - targets) > 0.25 * targets).sum())

    report = {
        "targets": targets.tolist(),
        "realized_lengths": lengths.tolist(),
        "off_target": off_target,
        "amplify": amp,
        "gap": gap,
        "gate_channel": j,
    }
    return spk, lengths, report
