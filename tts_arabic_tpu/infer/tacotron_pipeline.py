"""Tacotron2 inference pipelines: `Tacotron2TTS.ttmel()` /
`Tacotron2Wave.tts()`.

Capability parity with the reference wrappers
(`models/tacotron2/networks.py:70-426`): EOS-aware mel postprocessing (insert
an extra separator token when the final real token is "unsafe", then truncate
the mel where that token's attention first peaks — `needs_postprocessing`/
`truncate_mel`, networks.py:39-49), speed control via bicubic mel resize
(`resize_mel`, networks.py:52-67), vowelizer hooks, batched synthesis
(default batch_size 8), HiFi-GAN + denoiser vocoding.

TPU execution: the autoregressive decode is ONE compiled `lax.while_loop`
with early exit (static decoder_max_step bound), one signature per
(batch, text-bucket); vocoding reuses the chunked HiFi-GAN path with a
bucketed mel length.
"""
from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import text as text_frontend
from ..models.tacotron2 import Tacotron2, Tacotron2Config
from ..models.torch_import import (hifigan_params_from_torch,
                                   tacotron2_params_from_torch)
from ..runtime.checkpoint import load_states, load_torch_state_dict
from ..vocoder import denoiser as denoiser_mod
from ..vocoder.hifigan import Generator, HiFiGANConfig, chunked_vocode
from .pipeline import (LOG_MEL_PAD, MEL_BUCKETS, TEXT_BUCKET, cast_floating,
                       _default_vocoder_paths, _pad_ids, _pick_mel_bucket,
                       _round_up)

# tokens whose trailing sound tends to get cut by the stop token; after these
# the reference inserts an extra separator and truncates on its attention
# (networks.py:39-41)
_SAFE_FINAL_TOKENS = frozenset(
    ["a", "i", "u", "aa", "ii", "uu", "n", "m", "h"])
N_EOS = len(text_frontend.EOS_TOKENS)  # separator + eos


def _speaker_array(speaker_id, n: int) -> np.ndarray:
    """Scalar or per-utterance speaker ids -> int32 [n] (beyond reference:
    `Tacotron2Wave.tts` there takes only a scalar, networks.py:353)."""
    spk = np.asarray(speaker_id, np.int32)
    if spk.ndim == 0:
        return np.full((n,), int(spk), np.int32)
    if spk.shape != (n,):
        raise ValueError(
            f"speaker_id must be a scalar or a length-{n} sequence, "
            f"got shape {spk.shape}")
    return spk


def _subset_speakers(speaker_id, idxs):
    """Slice a per-utterance speaker sequence down to a batch's indices
    (identity on scalars)."""
    if np.ndim(speaker_id) == 0:
        return speaker_id
    return np.asarray(speaker_id, np.int32)[np.asarray(idxs, int)]


def needs_postprocessing(token: str) -> bool:
    return token not in _SAFE_FINAL_TOKENS


def truncate_mel(mel: np.ndarray, attn_col: np.ndarray) -> np.ndarray:
    """Crop [n_mels, T] where the end-marker token's attention first reaches
    80% of its max; pad 3 replicated frames (networks.py:44-49)."""
    peak = attn_col.max()
    idx = np.flatnonzero(attn_col >= 0.8 * peak)
    n_end = int(idx[0]) if idx.size else mel.shape[1]
    cut = mel[:, :max(n_end, 1)]
    return np.concatenate([cut, np.repeat(cut[:, -1:], 3, axis=1)], axis=1)


def resize_mel(mel: np.ndarray, rate: float = 1.0) -> np.ndarray:
    """Speed control by cubic time-axis resize of [n_mels, T]
    (networks.py:52-67; torch bicubic -> jax.image cubic)."""
    n_mels, T = mel.shape
    T_new = int(T / rate)
    if T_new == T:
        return mel
    out = jax.image.resize(jnp.asarray(mel), (n_mels, T_new), method="cubic")
    return np.asarray(out)


class Tacotron2TTS:
    """Text -> mel via autoregressive Tacotron2 (reference `Tacotron2`
    wrapper equivalent)."""

    def __init__(self, checkpoint=None, config: Tacotron2Config | None = None,
                 arabic_in: bool = True, vowelizer: Optional[str] = None,
                 decoder_max_step: int = 3000, seed: int = 0,
                 compute_dtype=None, strict_text: bool = False):
        """compute_dtype: jnp.bfloat16 runs the autoregressive decode in
        bf16 (measured 1.25x e2e on TPU v5e, waveform deviation ~0.5%
        rel-RMSE vs f32 with unchanged decode lengths; the per-step LSTM +
        attention weight streaming is HBM-bound, so halving weight bytes
        is most of the step). None (default) = full f32 for exact
        reference parity.

        strict_text: False (default) drops tokens outside the symbol
        table (trailing punctuation); True reproduces the reference
        KeyError (`text/__init__.py:24-27`) for bug-parity testing."""
        self.arabic_in = arabic_in
        self.strict_text = strict_text
        self.compute_dtype = compute_dtype
        self.default_vowelizer = vowelizer
        self._vowelizers = {}
        self.phon_to_id = None
        self.decoder_max_step = decoder_max_step

        variables = None
        if checkpoint is not None:
            variables, config = self._load_checkpoint(checkpoint, config)
        self.config = config or Tacotron2Config()
        self.model = Tacotron2(self.config)
        if variables is None:
            rng = np.random.default_rng(seed)
            tokens = jnp.asarray(rng.integers(1, self.config.n_symbols,
                                              (1, 8)), jnp.int32)
            lens = jnp.asarray([8], jnp.int32)
            mel = jnp.zeros((1, 4, self.config.n_mels))
            variables = self.model.init(jax.random.PRNGKey(seed), tokens,
                                        lens, mel, jnp.asarray([4]))
        self.variables = variables
        self._infer_jit = jax.jit(self._infer_fn,
                                  static_argnames=("max_steps",))

    def _load_checkpoint(self, checkpoint, config):
        path = str(checkpoint)
        if path.endswith(".pth") or path.endswith(".pt"):
            sd = load_torch_state_dict(path)
            extras = sd.pop("__extras__", {})
            if config is None:
                ref_cfg = extras.get("config") or {}
                config = Tacotron2Config(**{
                    k: v for k, v in ref_cfg.items()
                    if k in Tacotron2Config.__dataclass_fields__})
            if "symbols" in extras:
                self.phon_to_id = {p: i for i, p in
                                   enumerate(extras["symbols"])}
            return tacotron2_params_from_torch(sd, config), config
        state = load_states(path)
        if config is None:
            cfg_dict = (state.get("config") or {}).get("net_config")
            config = (Tacotron2Config(**cfg_dict) if cfg_dict
                      else Tacotron2Config())
        variables = {"params": state["model"]}
        if "batch_stats" in state:
            variables["batch_stats"] = state["batch_stats"]
        return variables, config

    # -- text frontend (append_space=True, unlike FastPitch) -----------------

    def _vowelize(self, utterance: str, vowelizer: Optional[str]):
        name = vowelizer or self.default_vowelizer
        if name is None:
            return utterance
        if name not in self._vowelizers:
            from ..diacritizers import load_vowelizer
            self._vowelizers[name] = load_vowelizer(name)
        arabic = text_frontend.buckwalter_to_arabic(utterance)
        return self._vowelizers[name].predict(arabic)

    def tokenize(self, utterance: str, vowelizer: Optional[str] = None):
        utterance = self._vowelize(utterance, vowelizer)
        if self.arabic_in:
            toks = text_frontend.arabic_to_tokens(utterance)
        else:
            toks = text_frontend.buckwalter_to_tokens(utterance)
        if not self.strict_text:
            # sanitize ONCE, at the TOKEN level, so every downstream
            # consumer (EOS-postprocess index, attention-column gather,
            # strict ids mapping at dispatch) sees one consistent sequence
            toks = text_frontend.sanitize_tokens(toks, self.phon_to_id)
        else:
            # reference bug-parity: raise the KeyError-on-punctuation
            # (text/__init__.py:24-27) eagerly at the tokenize boundary
            text_frontend.tokens_to_ids(toks, self.phon_to_id)
        return toks

    def tokenize_batch(self, batch: List[str],
                       vowelizer: Optional[str] = None):
        """Batch tokenize with ONE batched diacritizer forward when a
        vowelizer is active (see FastPitchTTS.tokenize_batch)."""
        name = vowelizer or self.default_vowelizer
        if name is None:
            return [self.tokenize(t) for t in batch]
        if name not in self._vowelizers:
            from ..diacritizers import load_vowelizer
            self._vowelizers[name] = load_vowelizer(name)
        arabic = [text_frontend.buckwalter_to_arabic(t) for t in batch]
        vowelized = self._vowelizers[name].predict(arabic)
        to_tokens = (text_frontend.arabic_to_tokens if self.arabic_in
                     else text_frontend.buckwalter_to_tokens)
        toks_list = [to_tokens(v) for v in vowelized]
        if not self.strict_text:
            toks_list = [text_frontend.sanitize_tokens(t, self.phon_to_id)
                         for t in toks_list]
        return toks_list

    # -- jitted inference ----------------------------------------------------

    def _infer_fn(self, variables, tokens, token_lens, speaker_ids, rng, *,
                  max_steps):
        dt = self.compute_dtype
        variables = cast_floating(variables, dt)
        out = self.model.apply(variables, tokens, token_lens, speaker_ids,
                               max_steps=max_steps, rng=rng,
                               method=Tacotron2.infer)
        if dt is not None:
            out = {k: v.astype(jnp.float32)
                   if jnp.issubdtype(v.dtype, jnp.floating) else v
                   for k, v in out.items()}
        return out

    def _dispatch_infer(self, tokens_list: List[List[str]], speaker_id: int,
                        pad_to=None, rng=None):
        """Token lists -> device handles (ASYNC, no host sync):
        (out dict, token lens, inverse order)."""
        n_real = len(tokens_list)
        # tokenize()/tokenize_batch() already sanitized these lists (unless
        # strict_text, where raising IS the reference behavior) — map
        # strictly so the EOS-postprocess separator _prepare_tokens inserts
        # (`.. _+_ _+_ _eos_`) is NOT re-collapsed by a second sanitize
        # pass, keeping ids aligned with token positions.
        ids_list = [np.asarray(text_frontend.tokens_to_ids(
            t, self.phon_to_id), np.int32) for t in tokens_list]
        lens = np.asarray([len(x) for x in ids_list])
        order = np.argsort(-lens)
        ids_sorted = [ids_list[i] for i in order]
        lens_sorted = lens[order]
        spk_sorted = _speaker_array(speaker_id, n_real)[order]
        if pad_to is not None and n_real < pad_to:
            ids_sorted = list(ids_sorted) + [np.zeros(1, np.int32)] * (
                pad_to - n_real)
            lens_sorted = np.concatenate(
                [lens_sorted, np.ones(pad_to - n_real, np.int64)])
            spk_sorted = np.concatenate(
                [spk_sorted, np.zeros(pad_to - n_real, np.int32)])
        padded = _pad_ids(ids_sorted, _round_up(int(lens.max()), TEXT_BUCKET))
        if rng is None:
            rng = jax.random.PRNGKey(0)
        out = self._infer_jit(
            self.variables, jnp.asarray(padded),
            jnp.asarray(lens_sorted, jnp.int32),
            jnp.asarray(spk_sorted), rng,
            max_steps=self.decoder_max_step)
        inverse = np.argsort(order)
        return out, lens, inverse

    def _infer_batch(self, tokens_list: List[List[str]], speaker_id: int,
                     pad_to=None, rng=None):
        """Token lists -> (mel_postnet [B,S,80], lens, aligns, inverse)."""
        out, lens, inverse = self._dispatch_infer(tokens_list, speaker_id,
                                                  pad_to, rng)
        # one batched transfer (separate fetches each cost a tunnel RTT)
        mel, mel_lens, aligns = jax.device_get(
            (out["mel_postnet"], out["mel_lens"], out["alignments"]))
        return mel, mel_lens, aligns, lens, inverse

    # -- public API ----------------------------------------------------------

    def _prepare_tokens(self, batch: List[str], vowelizer,
                        postprocess_mel: bool):
        """Tokenize + EOS-postprocess token insertion (networks.py:134-137).
        Returns (tokens_list, do_post flags)."""
        tokens_list = self.tokenize_batch(batch, vowelizer)
        do_post = []
        for toks in tokens_list:
            p = postprocess_mel and needs_postprocessing(toks[-N_EOS - 1])
            if p:
                toks.insert(-N_EOS, text_frontend.SEPARATOR)
            do_post.append(p)
        return tokens_list, do_post

    def _finish_ttmel(self, mel_post, mel_lens, aligns, inverse, tokens_list,
                      do_post, speed):
        """Host postprocess of fetched decode outputs -> list of [80, T]."""
        mels = []
        for j, i in enumerate(inverse):
            L = mel_lens[i]
            mel = mel_post[i, :L].T  # [n_mels, T]
            if do_post[j]:
                tok_len = len(tokens_list[j])
                attn_col = aligns[i, :L, tok_len - N_EOS - 1]
                mel = truncate_mel(mel, attn_col)
            if speed is not None:
                mel = resize_mel(mel, rate=speed)
            mels.append(mel)
        return mels

    def ttmel_batch(self, batch: List[str], speaker_id: int = 0,
                    speed: Optional[float] = None,
                    vowelizer: Optional[str] = None,
                    postprocess_mel: bool = True, pad_to=None):
        tokens_list, do_post = self._prepare_tokens(batch, vowelizer,
                                                    postprocess_mel)
        mel_post, mel_lens, aligns, _, inverse = self._infer_batch(
            tokens_list, speaker_id, pad_to)
        return self._finish_ttmel(mel_post, mel_lens, aligns, inverse,
                                  tokens_list, do_post, speed)

    def ttmel_single(self, utterance: str, **kw):
        return self.ttmel_batch([utterance], **kw)[0]

    def ttmel(self, text_input: Union[str, List[str]], speaker_id: int = 0,
              speed: Optional[float] = None, batch_size: int = 1,
              vowelizer: Optional[str] = None, postprocess_mel: bool = True):
        kw = dict(speed=speed, vowelizer=vowelizer,
                  postprocess_mel=postprocess_mel)
        if isinstance(text_input, str):
            if np.ndim(speaker_id) != 0:  # accept a length-1 sequence;
                speaker_id = int(_speaker_array(speaker_id, 1)[0])
            return self.ttmel_single(text_input, speaker_id=speaker_id, **kw)
        if np.ndim(speaker_id) != 0:  # validate per-utterance length once
            speaker_id = _speaker_array(speaker_id, len(text_input))
        out = []
        bs = max(batch_size, 1)
        for k in range(0, len(text_input), bs):
            out += self.ttmel_batch(
                text_input[k: k + bs], pad_to=bs,
                speaker_id=_subset_speakers(speaker_id,
                                            range(k, min(k + bs,
                                                         len(text_input)))),
                **kw)
        return out


class Tacotron2Wave:
    """End-to-end autoregressive text -> waveform (reference `Tacotron2Wave`
    equivalent, networks.py:256-426)."""

    def __init__(self, model_sd_path=None, vocoder_sd=None,
                 vocoder_config=None, vowelizer: Optional[str] = None,
                 arabic_in: bool = True, config=None, seed: int = 0,
                 compute_dtype=None, mrf_strategy: str = "auto",
                 strict_text: bool = False,
                 quantize: Optional[str] = None):
        """mrf_strategy: HiFi-GAN MRF implementation — same knob as
        `FastPitch2Wave` (docs/PERF.md; "auto" = packed-lane XLA rewrite
        at 32 channels).

        quantize: None or "int8" — static-calibrated int8 MRF stages, the
        same opt-in as `FastPitch2Wave(quantize="int8")`; constructor-time
        calibration decodes a built-in text set through this model."""
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}; "
                             "supported: 'int8'")
        self.model = Tacotron2TTS(model_sd_path, config=config,
                                  arabic_in=arabic_in, vowelizer=vowelizer,
                                  seed=seed, compute_dtype=compute_dtype,
                                  strict_text=strict_text)
        vocoder_sd, vocoder_config = _default_vocoder_paths(
            vocoder_sd, vocoder_config,
            enabled=model_sd_path is not None)
        if vocoder_config is not None:
            self.vocoder_config = HiFiGANConfig.from_json(vocoder_config)
        else:
            self.vocoder_config = HiFiGANConfig()
        self.vocoder = Generator(self.vocoder_config)
        if vocoder_sd is not None:
            sd = load_torch_state_dict(vocoder_sd)
            sd.pop("__extras__", None)
            self.vocoder_vars = hifigan_params_from_torch(
                sd, self.vocoder_config)
        else:
            mel = jnp.zeros((1, 16, self.vocoder_config.num_mels))
            self.vocoder_vars = self.vocoder.init(
                jax.random.PRNGKey(seed + 1), mel)
        self.bias_spec = jax.jit(
            lambda v: denoiser_mod.compute_bias_spec(self.vocoder.apply, v)
        )(self.vocoder_vars)
        self._voc_apply = self.vocoder.apply
        self._voc_strategy = "xla"
        if (mrf_strategy != "xla" and self.vocoder_config.resblock == "1"
                and jax.devices()[0].platform == "tpu"):
            from ..ops.hifigan_pallas import generator_apply_pallas
            cfg = self.vocoder_config
            self._voc_strategy = mrf_strategy
            self._voc_apply = (
                lambda v, m: generator_apply_pallas(
                    v, m, cfg, strategy=mrf_strategy))
        self._int8_scales = None
        self._rebuild_vocode_jit()
        if quantize == "int8":
            self.calibrate_int8()

    def _rebuild_vocode_jit(self):
        """(Re)create the vocode jit around a FRESH closure (bound methods
        of one object hash equal — re-jitting `self._vocode_fn` after
        `_voc_apply` changed would reuse the stale trace), and drop the
        stream jits so they lazily rebuild with the new vocoder path."""
        fn = lambda *a, **kw: self._vocode_fn(*a, **kw)  # noqa: E731
        self._vocode_jit = jax.jit(fn, static_argnames=("use_denoiser",
                                                        "out_int16"))
        for attr in ("_enc_stream_jit", "_seg_jit", "_win_jit"):
            if hasattr(self, attr):
                delattr(self, attr)

    def calibrate_int8(self, texts: Optional[List[str]] = None, mels=None,
                       min_ch: int = 64, margin: float = 1.0):
        """Switch the vocoder to the static-calibrated int8 MRF path (same
        contract as `FastPitch2Wave.calibrate_int8`; HiFi-GAN ResBlock1
        only). `mels`: [B, T, 80] array(s); or `texts` are decoded through
        this model (default: the built-in calibration set)."""
        if self.vocoder_config.resblock != "1":
            raise ValueError("int8 quantization covers HiFi-GAN ResBlock1 "
                             "configs")
        from ..ops.hifigan_int8 import (collect_mrf_scales,
                                        generator_apply_int8)
        if mels is None:
            from .pipeline import (_INT8_CALIB_ARABIC,
                                   _INT8_CALIB_BUCKWALTER)
            batch = texts or (_INT8_CALIB_ARABIC if self.model.arabic_in
                              else _INT8_CALIB_BUCKWALTER)
            got = self.model.ttmel_batch(list(batch))  # [80, T] each
            bucket = _pick_mel_bucket(max(m.shape[1] for m in got))
            stacked = np.full((len(got), bucket, got[0].shape[0]),
                              LOG_MEL_PAD, np.float32)
            for i, m in enumerate(got):
                stacked[i, : m.shape[1]] = m.T
            mels = [stacked]
        elif hasattr(mels, "ndim"):
            mels = [mels]
        dt = self.model.compute_dtype
        voc_vars = (self.vocoder_vars if dt is None
                    else cast_floating(self.vocoder_vars, dt))
        mels = [jnp.asarray(m) if dt is None else jnp.asarray(m).astype(dt)
                for m in mels]
        scales = collect_mrf_scales(voc_vars, mels, self.vocoder_config,
                                    min_ch=min_ch, margin=margin)
        cfg, strategy = self.vocoder_config, self._voc_strategy
        self._voc_apply = (
            lambda v, m: generator_apply_int8(v, m, cfg, scales,
                                              min_ch=min_ch,
                                              strategy=strategy))
        self._int8_scales = scales
        self._rebuild_vocode_jit()
        return scales

    @property
    def sample_rate(self):
        return self.vocoder_config.sampling_rate

    # -- fused device path: decode -> truncate -> vocode in ONE program ------
    #
    # The split path fetches f32 mel_postnet AND alignments to the host,
    # postprocesses there, then re-uploads mels to vocode — ~50 MB of
    # tunnel traffic per 32-utterance batch, while the decode itself costs
    # ~70 ms on a v5e (BENCH_DETAIL.json t2_decode_compute_only). Fusing
    # keeps everything on device and ships ONLY int16 waves (~4x less
    # data, no H2D round trip). The EOS truncation (reference
    # networks.py:44-49) is computed in-graph: per-sample gather of the
    # end-marker token's attention column, 80%-of-peak threshold, replicate
    # pad. Used by tts() whenever speed and return_mel are not requested.

    def _newlen_fn(self, alignments, mel_lens, trunc_idx, do_post):
        """In-graph EOS truncation decision (reference truncate_mel,
        networks.py:44-49): first frame where the end-marker token's
        attention reaches 80% of its peak. Returns (n_end, new_len)."""
        S = alignments.shape[1]
        col = jnp.take_along_axis(
            alignments, trunc_idx[:, None, None], axis=2)[..., 0]
        colv = jnp.where(jnp.arange(S)[None, :] < mel_lens[:, None],
                         col, -jnp.inf)
        hit = colv >= 0.8 * jnp.max(colv, axis=1, keepdims=True)
        n_end = jnp.where(jnp.any(hit, axis=1),
                          jnp.argmax(hit, axis=1), mel_lens)
        n_end = jnp.maximum(n_end, 1)
        return n_end, jnp.where(do_post, n_end + 3, mel_lens)

    def _assemble_fn(self, mel, n_end, new_len, do_post, *, bucket):
        """Build the bucket-length vocoder input on device — exactly the
        buffer the host path stacks (truncate + 3 replicate frames +
        LOG_MEL_PAD), so the downstream vocode program is the same one the
        host path runs. Pure data movement: bitwise-identical values."""
        B, S, n_mels = mel.shape
        t = jnp.arange(bucket)
        rep = do_post[:, None] & (t[None, :] >= n_end[:, None])
        idx = jnp.where(rep, (n_end - 1)[:, None],
                        jnp.minimum(t, S - 1)[None, :])
        out = jnp.take_along_axis(mel, idx[:, :, None], axis=1)
        return jnp.where(t[None, :, None] < new_len[:, None, None], out,
                         jnp.asarray(LOG_MEL_PAD, mel.dtype))

    def _dispatch_fused(self, tokens_list, do_post, speaker_id, denoise,
                        pad_to=None, rng=None, out_int16=False):
        """Token lists -> (decode handles, n_end, new_len, post, inverse).
        ASYNC — the decode stays on device; only new_len is later fetched."""
        if not hasattr(self, "_newlen_jit"):
            self._newlen_jit = jax.jit(self._newlen_fn)
            self._assemble_jit = jax.jit(self._assemble_fn,
                                         static_argnames=("bucket",))
        m = self.model
        n_real = len(tokens_list)
        # strict mapping on pre-sanitized lists (see _dispatch_infer): the
        # inserted EOS-postprocess separator must survive, so id count ==
        # token count and the end-marker index is consistent everywhere
        ids_list = [np.asarray(text_frontend.tokens_to_ids(
            t, m.phon_to_id), np.int32) for t in tokens_list]
        trunc = np.asarray([len(x) - N_EOS - 1 for x in ids_list],
                           np.int32)
        post = np.asarray(do_post, bool)
        lens = np.asarray([len(x) for x in ids_list])
        order = np.argsort(-lens)
        ids_sorted = [ids_list[i] for i in order]
        lens_sorted, trunc, post = lens[order], trunc[order], post[order]
        spk_sorted = _speaker_array(speaker_id, n_real)[order]
        if pad_to is not None and n_real < pad_to:
            pad = pad_to - n_real
            ids_sorted += [np.zeros(1, np.int32)] * pad
            lens_sorted = np.concatenate([lens_sorted, np.ones(pad, np.int64)])
            trunc = np.concatenate([trunc, np.zeros(pad, np.int32)])
            post = np.concatenate([post, np.zeros(pad, bool)])
            spk_sorted = np.concatenate([spk_sorted, np.zeros(pad, np.int32)])
        padded = _pad_ids(ids_sorted, _round_up(int(lens.max()), TEXT_BUCKET))
        if rng is None:
            rng = jax.random.PRNGKey(0)
        out = m._infer_jit(
            m.variables, jnp.asarray(padded),
            jnp.asarray(lens_sorted, jnp.int32),
            jnp.asarray(spk_sorted), rng,
            max_steps=m.decoder_max_step)
        n_end, new_len = self._newlen_jit(
            out["alignments"], out["mel_lens"],
            jnp.asarray(np.maximum(trunc, 0)), jnp.asarray(post))
        return (out, n_end, new_len, jnp.asarray(post), denoise, out_int16,
                np.argsort(order))

    # crop granularity (frames) for the device-side wave trim before D2H
    _CROP_FRAMES = 64

    def _collect_fused(self, handles):
        """One tiny new_len fetch picks the mel bucket (the same
        _pick_mel_bucket the host path uses), then assemble+vocode run on
        device and only the cropped wave crosses D2H."""
        out, n_end, new_len, post, denoise, out_int16, inverse = handles
        new_lens_np = np.asarray(new_len)
        bucket = _pick_mel_bucket(max(int(new_lens_np.max()), 1))
        mel_proc = self._assemble_jit(out["mel_postnet"], n_end, new_len,
                                      post, bucket=bucket)
        wave = self._vocode_jit(
            self.vocoder_vars, self.bias_spec, mel_proc,
            jnp.float32(denoise), use_denoiser=denoise > 0,
            out_int16=out_int16)
        hop = self.vocoder_config.hop_length
        frames = _round_up(int(new_lens_np.max()), self._CROP_FRAMES)
        if frames * hop < wave.shape[1]:
            wave = wave[:, : frames * hop]
        wave = np.asarray(wave)
        return [wave[i, : new_lens_np[i] * hop] for i in inverse]

    def _vocode_fn(self, voc_vars, bias_spec, mel, strength, *, use_denoiser,
                   out_int16=False):
        dt = self.model.compute_dtype
        if dt is not None:  # bf16 vocoding, matching the FastPitch wave jit
            voc_vars, mel = cast_floating(voc_vars, dt), mel.astype(dt)
        wave = chunked_vocode(self._voc_apply, voc_vars, mel,
                              pad_value=LOG_MEL_PAD)
        wave = wave.astype(jnp.float32)
        if use_denoiser:
            wave = denoiser_mod.denoise(wave, bias_spec, strength)
        if out_int16 == "mulaw":
            from ..audio import mulaw_encode
            wave = mulaw_encode(wave)  # uint8 companded D2H (audio.mulaw_decode)
        elif out_int16:
            # device-side PCM conversion halves the D2H transfer
            wave = (jnp.clip(wave, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        return wave

    def _dispatch_vocode(self, mels, denoise, out_int16=False):
        """Stack host mels at a bucketed length, dispatch the vocoder jit
        (async). Returns (wave handle, per-mel frame lens)."""
        lens = [m.shape[1] for m in mels]
        bucket = _pick_mel_bucket(max(lens))
        stacked = np.full((len(mels), bucket, mels[0].shape[0]), LOG_MEL_PAD,
                          np.float32)
        for i, m in enumerate(mels):
            stacked[i, : m.shape[1]] = m.T
        wave = self._vocode_jit(
            self.vocoder_vars, self.bias_spec, jnp.asarray(stacked),
            jnp.float32(denoise), use_denoiser=denoise > 0,
            out_int16=out_int16)
        return wave, lens

    def _split_waves(self, wave, lens):
        hop = self.vocoder_config.hop_length
        return [wave[i, : lens[i] * hop] for i in range(len(lens))]

    def tts_batch(self, batch: List[str], speaker_id: int = 0,
                  speed: Optional[float] = None, denoise: float = 0.0,
                  vowelizer: Optional[str] = None, pitch_mul=None,
                  pitch_add=None, postprocess_mel: bool = True,
                  return_mel: bool = False, pad_to=None,
                  out_int16: bool = False):
        mels = self.model.ttmel_batch(batch, speaker_id=speaker_id,
                                      speed=speed, vowelizer=vowelizer,
                                      postprocess_mel=postprocess_mel,
                                      pad_to=pad_to)
        # vocode the whole batch at a bucketed length (the reference loops
        # the vocoder per mel, networks.py:340-345)
        wave, lens = self._dispatch_vocode(mels, denoise, out_int16)
        waves = self._split_waves(np.asarray(wave), lens)
        if return_mel:
            return waves, mels
        return waves

    def tts_single(self, utterance: str, **kw):
        out = self.tts_batch([utterance], **kw)
        if kw.get("return_mel"):
            return out[0][0], out[1][0]
        return out[0]

    # -- streaming synthesis (segmented autoregressive decode) ---------------

    # margin around each emitted core: postnet RF (10) + HiFi-GAN RF (~13)
    # + denoiser STFT context (4), rounded up
    _STREAM_MARGIN = 32

    def _stream_win_fn(self, variables, voc_vars, bias_spec, mel_w, valid,
                       strength, *, use_denoiser, out_int16):
        """Postnet + vocode one mel window [1, W, n_mels] (pre-postnet).
        Frames at index >= `valid` are reset to LOG_MEL_PAD after the
        postnet, reproducing the batch path's bucket padding exactly."""
        dt = self.model.compute_dtype
        if dt is not None:
            variables, voc_vars, mel_w = (cast_floating(variables, dt),
                                          cast_floating(voc_vars, dt),
                                          mel_w.astype(dt))
        post = mel_w + self.model.model.apply(variables, mel_w,
                                              method=Tacotron2.postnet)
        idx = jnp.arange(mel_w.shape[1])[None, :, None]
        post = jnp.where(idx < valid, post,
                         jnp.asarray(LOG_MEL_PAD, post.dtype))
        wave = self._voc_apply(voc_vars, post).astype(jnp.float32)
        if use_denoiser:
            wave = denoiser_mod.denoise(wave, bias_spec, strength)
        if out_int16 == "mulaw":
            from ..audio import mulaw_encode
            wave = mulaw_encode(wave)
        elif out_int16:
            wave = (jnp.clip(wave, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        return wave

    def _make_stream_jits(self):
        m = self.model
        dt = m.compute_dtype

        def enc_fn(variables, tokens, token_lens, speakers):
            variables = cast_floating(variables, dt)
            enc = m.model.apply(variables, tokens, token_lens, speakers,
                                method=Tacotron2.encode_infer)
            carry = m.model.apply(variables, enc["memory"],
                                  method=Tacotron2.init_decode_carry)
            return enc, carry

        def seg_fn(variables, carry, enc, rng, *, n_steps):
            return m.model.apply(cast_floating(variables, dt), carry, enc,
                                 rng, n_steps=n_steps,
                                 method=Tacotron2.decode_segment)

        self._enc_stream_jit = jax.jit(enc_fn)
        self._seg_jit = jax.jit(seg_fn, static_argnames=("n_steps",))
        self._win_jit = jax.jit(self._stream_win_fn,
                                static_argnames=("use_denoiser", "out_int16"))

    def stream(self, utterance: str, chunk_frames: int = 96,
               denoise: float = 0.005, speaker_id: int = 0,
               vowelizer: Optional[str] = None, out_int16: bool = False):
        """Streaming autoregressive synthesis: the decode runs in
        `chunk_frames`-step jitted segments and audio chunks are yielded
        as soon as the postnet/vocoder lookahead margin is decoded —
        first-audio latency is ~one segment instead of the full decode
        (the reference has no streaming story; its decode is one opaque
        torchaudio loop). Matches `tts_single(postprocess_mel=False)` to
        float tolerance: segment bodies are the exact `infer` loop step,
        and every emitted core carries a decoded margin >= postnet +
        HiFi-GAN + denoiser receptive fields, with beyond-length frames
        reset to the batch path's LOG_MEL_PAD."""
        m = self.model
        toks = m.tokenize(utterance, vowelizer)
        ids = np.asarray(text_frontend.tokens_to_ids(
            toks, m.phon_to_id), np.int32)
        padded = _pad_ids([ids], _round_up(len(ids), TEXT_BUCKET))
        if not hasattr(self, "_seg_jit"):
            self._make_stream_jits()
        enc, carry = self._enc_stream_jit(
            m.variables, jnp.asarray(padded),
            jnp.asarray([len(ids)], jnp.int32),
            jnp.asarray([speaker_id], jnp.int32))
        rng = jax.random.PRNGKey(0)  # same as _dispatch_infer's default

        margin = self._STREAM_MARGIN
        W = chunk_frames + 2 * margin
        hop = self.vocoder_config.hop_length
        mel_acc = np.zeros((1, 0, self.vocoder_config.num_mels), np.float32)
        emitted, length, done = 0, 0, False
        t_host, first_seg = 0, True  # decode_setup starts the step clock at 0

        while True:
            if not done:
                # the FIRST segment decodes chunk+margin steps so the first
                # core's lookahead margin lands in one segment round trip
                # instead of two (time-to-first-audio is RTT-bound over the
                # tunnel); the tail segment is capped so the decode stops
                # exactly at decoder_max_step, matching tts_single()
                # (n_steps is static — each distinct value costs a compile)
                want = chunk_frames + (margin if first_seg else 0)
                n_steps = min(want, m.decoder_max_step - t_host)
                if n_steps <= 0:
                    done = True
                else:
                    carry, seg = self._seg_jit(m.variables, carry, enc, rng,
                                               n_steps=n_steps)
                    first_seg = False
                    # ONE batched device_get per segment (each separate
                    # scalar fetch costs a tunnel round trip)
                    n_new, mel_seg, lengths, fin, t_dev = jax.device_get(
                        (seg["n_new"], seg["mel"], carry["lengths"],
                         carry["finished"], carry["t"]))
                    n_new, t_host = int(n_new), int(t_dev)
                    if n_new:
                        mel_acc = np.concatenate(
                            [mel_acc, np.asarray(mel_seg[:, :n_new],
                                                 np.float32)], axis=1)
                    length = int(lengths[0])
                    done = (bool(fin.all())
                            or t_host >= m.decoder_max_step
                            or n_new == 0)
            # emit every core whose lookahead margin is decoded (all
            # remaining cores once the decode is done)
            while emitted < length and (
                    done or mel_acc.shape[1] - (emitted + chunk_frames)
                    >= margin):
                core_len = min(chunk_frames, length - emitted)
                start = emitted - margin
                window = np.zeros((1, W, mel_acc.shape[2]), np.float32)
                lo, hi = max(start, 0), min(start + W, mel_acc.shape[1])
                window[:, lo - start: hi - start] = mel_acc[:, lo:hi]
                wave_w = self._win_jit(
                    m.variables, self.vocoder_vars, self.bias_spec,
                    jnp.asarray(window), jnp.int32(length - start),
                    jnp.float32(denoise), use_denoiser=denoise > 0,
                    out_int16=out_int16)
                off = emitted - start
                yield np.asarray(
                    wave_w[0, off * hop: (off + core_len) * hop])
                emitted += core_len
            if done and emitted >= length:
                return

    def warmup(self, batch_sizes=(1,), text_buckets=(16, 32),
               denoise: float = 0.005, out_int16: bool = False):
        """Precompile the fused decode->truncate->vocode signatures a
        serving deployment will hit (one per (batch, text-bucket); the
        decode jit's step bound is the static `decoder_max_step`). Each
        warmup entry runs a full-length decode on dummy tokens, so this
        costs real decode time — do it once at server start (the
        compilations also land in the persistent cache). The vocode stage
        compiles for the mel bucket the dummy decode happens to produce;
        other buckets compile on first hit."""
        for bs in batch_sizes:
            for tb in text_buckets:
                toks = [["a"] * max(tb - N_EOS, 1)
                        + list(text_frontend.EOS_TOKENS)] * bs
                handles = self._dispatch_fused(
                    toks, [False] * bs, 0, denoise, pad_to=bs,
                    out_int16=out_int16)
                self._collect_fused(handles)

    def tts(self, text_input: Union[str, List[str]],
            speed: Optional[float] = None, denoise: float = 0.005,
            speaker_id: int = 0, batch_size: int = 8,
            vowelizer: Optional[str] = None, postprocess_mel: bool = True,
            return_mel: bool = False, out_int16: bool = False):
        """Synthesize speech (API parity with reference `Tacotron2Wave.tts`,
        networks.py:347-426). out_int16 converts to 16-bit PCM ON DEVICE,
        halving the D2H transfer (list path only, like
        `FastPitch2Wave.tts`). speaker_id: scalar, or a per-utterance
        sequence aligned with `text_input` (beyond reference — one batched
        decode can serve different speakers)."""
        kw = dict(speed=speed, denoise=denoise, vowelizer=vowelizer,
                  postprocess_mel=postprocess_mel, return_mel=return_mel)
        if isinstance(text_input, str):
            if np.ndim(speaker_id) != 0:  # accept a length-1 sequence;
                # reject longer ones HERE with the clear shape error
                # rather than deep inside _dispatch (ADVICE r4)
                speaker_id = int(_speaker_array(speaker_id, 1)[0])
            return self.tts_single(text_input, speaker_id=speaker_id, **kw)
        if np.ndim(speaker_id) != 0:  # validate per-utterance length once
            speaker_id = _speaker_array(speaker_id, len(text_input))
        m = self.model
        # GLOBAL length sort: homogeneous batches waste fewer autoregressive
        # decode steps (the while_loop runs until the LONGEST row stops) and
        # less bucket padding. Decodes are dispatched a bounded WINDOW ahead
        # of collection — deep enough that host-side mel postprocessing and
        # wave fetches overlap the later batches' decode compute, bounded so
        # device memory stays O(WINDOW) batches however long the request
        # list is (decode buffers are mel+alignments at decoder_max_step).
        WINDOW = 4
        order = sorted(range(len(text_input)),
                       key=lambda i: -len(text_input[i]))
        bs = max(batch_size, 1)
        batches = [order[k: k + bs] for k in range(0, len(order), bs)]
        waves = [None] * len(text_input)
        mels = [None] * len(text_input)

        if speed is None and not return_mel:
            # fused device path: decode+truncate+vocode in one program per
            # batch; waves are the only D2H traffic (see _fused_fn)
            in_flight = []

            def _collect_f(item):
                idxs, handles = item
                batch_waves = self._collect_fused(handles)
                for j, i in enumerate(idxs):
                    waves[i] = batch_waves[j]
            for idxs in batches:
                tokens_list, do_post = m._prepare_tokens(
                    [text_input[i] for i in idxs], vowelizer,
                    postprocess_mel)
                handles = self._dispatch_fused(
                    tokens_list, do_post,
                    _subset_speakers(speaker_id, idxs), denoise,
                    pad_to=bs, out_int16=out_int16)
                in_flight.append((idxs, handles))
                if len(in_flight) > WINDOW:
                    _collect_f(in_flight.pop(0))
            for item in in_flight:
                _collect_f(item)
            return waves

        def _collect(item):
            idxs, (tokens_list, do_post), (out, _, inverse) = item
            mel_np, len_np, align_np = jax.device_get(
                (out["mel_postnet"], out["mel_lens"], out["alignments"]))
            mels_b = m._finish_ttmel(mel_np, len_np, align_np, inverse,
                                     tokens_list, do_post, speed)
            wave, lens = self._dispatch_vocode(mels_b, denoise, out_int16)
            batch_waves = self._split_waves(np.asarray(wave), lens)
            for j, i in enumerate(idxs):
                waves[i] = batch_waves[j]
                mels[i] = mels_b[j]

        in_flight = []
        for idxs in batches:
            prepared = m._prepare_tokens([text_input[i] for i in idxs],
                                         vowelizer, postprocess_mel)
            dec = m._dispatch_infer(prepared[0],
                                    _subset_speakers(speaker_id, idxs),
                                    pad_to=bs)
            in_flight.append((idxs, prepared, dec))
            if len(in_flight) > WINDOW:
                _collect(in_flight.pop(0))
        for item in in_flight:
            _collect(item)
        return (waves, mels) if return_mel else waves
