"""High-level TTS inference pipelines (the framework's public API).

Mirrors the capability surface of the reference wrappers
(`models/fastpitch/networks.py:197-435`): `FastPitchTTS.ttmel()` and
`FastPitch2Wave.tts()` with the full kwarg set — speed, denoise, speaker_id,
batch_size, vowelizer, pitch_mul, pitch_add, return_mel — accepting Arabic
script or Buckwalter, str or list.

TPU-first execution model (instead of the reference's eager per-batch run):

1. tokenize on host; sort by length; chunk into batches
2. pad token ids to a TEXT bucket (multiple of 16) -> phase-A jit
   (`encode_infer`): encoder + duration/pitch/energy conditioning
3. one scalar sync: predicted mel lengths pick a MEL bucket
4. phase-B jit: length-regulate + decoder FFT + mel projection — and for
   tts(), the HiFi-GAN vocoder and spectral denoiser FUSED into the same
   program (the reference vocodes per-sample in a Python loop,
   networks.py:340-345)
5. crop to true lengths, unsort, return numpy

Each (batch, text-bucket, mel-bucket, static-kwargs) signature compiles
once and is cached by jax's jit cache. Bucket granularity bounds padding
waste to ~15% while keeping the compile count small.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import text as text_frontend
from ..models.fastpitch import FastPitch, FastPitchConfig
from ..models.torch_import import (fastpitch_params_from_torch,
                                   hifigan_params_from_torch)
from ..runtime.checkpoint import load_states, load_torch_state_dict
from ..vocoder import denoiser as denoiser_mod
from ..vocoder.hifigan import Generator, HiFiGANConfig

LOG_MEL_PAD = float(np.log(1e-5))  # log-mel floor = silence padding value

TEXT_BUCKET = 16
MEL_BUCKETS = (64, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072)


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def _pick_mel_bucket(n: int) -> int:
    for b in MEL_BUCKETS:
        if n <= b:
            return b
    return _round_up(n, 1024)


def _pad_ids(ids_list: Sequence[np.ndarray], length: int) -> np.ndarray:
    out = np.zeros((len(ids_list), length), np.int32)
    for i, ids in enumerate(ids_list):
        out[i, : len(ids)] = ids
    return out


class FastPitchTTS:
    """Text -> mel pipeline (reference `FastPitch` wrapper equivalent).

    checkpoint: path to our .ckpt, a reference .pth, or None (random init,
    for testing/benchmarks).
    """

    def __init__(self, checkpoint=None, config: FastPitchConfig | None = None,
                 arabic_in: bool = True, vowelizer: Optional[str] = None,
                 seed: int = 0):
        self.arabic_in = arabic_in
        self.default_vowelizer = vowelizer
        self._vowelizers = {}
        self.phon_to_id = None

        params = None
        if checkpoint is not None:
            params, config = self._load_checkpoint(checkpoint, config)
        self.config = config or FastPitchConfig()
        self.model = FastPitch(self.config)
        if params is None:
            tokens = jnp.zeros((1, 8), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), tokens,
                                     max_frames=16)
        self.variables = params
        self._encode_jit = jax.jit(functools.partial(self._encode_fn),
                                   static_argnames=("max_duration",))
        self._decode_jit = jax.jit(functools.partial(self._decode_fn),
                                   static_argnames=("max_frames",))

    # -- checkpoint loading --------------------------------------------------

    def _load_checkpoint(self, checkpoint, config):
        path = str(checkpoint)
        if path.endswith(".pth") or path.endswith(".pt"):
            sd = load_torch_state_dict(path)
            extras = sd.pop("__extras__", {})
            if config is None:
                ref_cfg = extras.get("config")
                config = (FastPitchConfig.from_reference_net_config(ref_cfg)
                          if ref_cfg else FastPitchConfig())
            if "symbols" in extras:
                self.phon_to_id = {p: i for i, p in
                                   enumerate(extras["symbols"])}
            return fastpitch_params_from_torch(sd, config), config
        state = load_states(path)
        if config is None:
            cfg_dict = (state.get("config") or {}).get("net_config")
            config = (FastPitchConfig(**cfg_dict) if cfg_dict
                      else FastPitchConfig())
        return {"params": state["model"]}, config

    # -- text frontend -------------------------------------------------------

    def _vowelize(self, utterance: str, vowelizer: Optional[str]):
        name = vowelizer or self.default_vowelizer
        if name is None:
            return utterance
        if name not in self._vowelizers:
            from ..diacritizers import load_vowelizer
            self._vowelizers[name] = load_vowelizer(name)
        arabic = text_frontend.buckwalter_to_arabic(utterance)
        return self._vowelizers[name].predict(arabic)

    def tokenize(self, utterance: str,
                 vowelizer: Optional[str] = None) -> np.ndarray:
        utterance = self._vowelize(utterance, vowelizer)
        if self.arabic_in:
            tokens = text_frontend.arabic_to_tokens(utterance,
                                                    append_space=False)
        else:
            tokens = text_frontend.buckwalter_to_tokens(utterance,
                                                        append_space=False)
        ids = text_frontend.tokens_to_ids(tokens, self.phon_to_id)
        return np.asarray(ids, np.int32)

    # -- jitted phases -------------------------------------------------------

    def _encode_fn(self, variables, tokens, pitch_mul, pitch_add, speaker,
                   *, max_duration=75.0):
        """pitch_mul/pitch_add/speaker are dynamic scalars: changing the
        control values never recompiles (only new bucket shapes do).

        fp32 matmuls: the TPU MXU's default bf16 passes perturb predicted
        durations enough to flip round() at frame boundaries, making output
        lengths differ from the fp32 reference. The encode phase is a tiny
        fraction of end-to-end FLOPs (decode+vocoder dominate), so full
        precision here buys deterministic CPU/TPU-identical durations for
        free."""
        with jax.default_matmul_precision("float32"):
            return self.model.apply(
                variables, tokens, speaker=speaker,
                pitch_mul=pitch_mul, pitch_add=pitch_add,
                max_duration=max_duration, method=FastPitch.encode_infer)

    def _decode_fn(self, variables, enc_out, durations, pace, *, max_frames):
        mel, mel_lens = self.model.apply(
            variables, enc_out, durations, max_frames, pace,
            method=FastPitch.decode)
        # mask padding frames to the log-mel silence floor so downstream
        # vocoding sees silence, not decoder noise
        frame_ids = jnp.arange(max_frames)[None, :, None]
        mel = jnp.where(frame_ids < mel_lens[:, None, None], mel, LOG_MEL_PAD)
        return mel, mel_lens

    def _encode_batch(self, ids_list, speaker_id, pitch_mul, pitch_add,
                      pad_to=None):
        """Sort + pad + run phase-A; returns (enc, dec-len estimator inputs,
        inverse order, n_real). Batch rows are padded to `pad_to` so partial
        batches reuse the full batch's compiled signature."""
        n_real = len(ids_list)
        lens = np.asarray([len(x) for x in ids_list])
        order = np.argsort(-lens)
        ids_sorted = [ids_list[i] for i in order]
        if pad_to is not None and n_real < pad_to:
            ids_sorted += [np.zeros(1, np.int32)] * (pad_to - n_real)
        tokens = _pad_ids(ids_sorted, _round_up(max(int(lens.max()), 1),
                                                TEXT_BUCKET))
        enc = self._encode_jit(self.variables, jnp.asarray(tokens),
                               jnp.float32(pitch_mul),
                               jnp.float32(pitch_add),
                               jnp.int32(speaker_id))
        inverse = np.argsort(order)
        return enc, inverse, n_real

    def _infer_batch_mel(self, ids_list, speed, speaker_id, pitch_mul,
                         pitch_add, pad_to=None):
        """Core batched mel synthesis; returns (mel [B,F,80], lens, inverse,
        bucket)."""
        enc, inverse, n_real = self._encode_batch(
            ids_list, speaker_id, pitch_mul, pitch_add, pad_to)
        dur = np.asarray(enc["dur_pred"])
        dec_lens = np.floor(dur / float(speed) + 0.5).astype(np.int64).sum(1)
        bucket = _pick_mel_bucket(int(dec_lens.max()))
        mel, mel_lens = self._decode_jit(
            self.variables, enc["enc_out"], enc["dur_pred"],
            jnp.float32(speed), max_frames=bucket)
        return mel, np.asarray(mel_lens), inverse, bucket

    # -- public API ----------------------------------------------------------

    def ttmel_batch(self, batch: List[str], speed: float = 1.0,
                    speaker_id: int = 0, vowelizer: Optional[str] = None,
                    pitch_mul: float = 1.0, pitch_add: float = 0.0,
                    pad_to=None):
        ids_list = [self.tokenize(t, vowelizer) for t in batch]
        mel, mel_lens, inverse, _ = self._infer_batch_mel(
            ids_list, speed, speaker_id, pitch_mul, pitch_add, pad_to)
        mel = np.asarray(mel)
        return [mel[i, : mel_lens[i]].T for i in inverse]  # [80, T] each

    def ttmel_single(self, utterance: str, **kw):
        return self.ttmel_batch([utterance], **kw)[0]

    def ttmel(self, text_input: Union[str, List[str]], speed: float = 1.0,
              speaker_id: int = 0, batch_size: int = 1,
              vowelizer: Optional[str] = None, pitch_mul: float = 1.0,
              pitch_add: float = 0.0):
        kw = dict(speed=speed, speaker_id=speaker_id, vowelizer=vowelizer,
                  pitch_mul=pitch_mul, pitch_add=pitch_add)
        if isinstance(text_input, str):
            return self.ttmel_single(text_input, **kw)
        out = []
        bs = max(batch_size, 1)
        for k in range(0, len(text_input), bs):
            out += self.ttmel_batch(text_input[k: k + bs], pad_to=bs, **kw)
        return out


class FastPitch2Wave:
    """End-to-end text -> waveform (reference `FastPitch2Wave` equivalent),
    with the vocoder + denoiser fused into the phase-B jit."""

    def __init__(self, model_sd_path=None, vocoder_sd=None,
                 vocoder_config=None, vowelizer: Optional[str] = None,
                 arabic_in: bool = True, config=None, seed: int = 0,
                 compute_dtype=None, vocoder_type: str = "hifigan"):
        """compute_dtype: jnp.bfloat16 runs the decoder+vocoder hot path on
        the MXU's native bf16 (~2x on TPU); weights stay fp32 in memory and
        are cast at trace time; the spectral denoiser stays fp32. None =
        full fp32.

        vocoder_type: "hifigan" (default) or "vocos" — the reference only
        exposes Vocos as a standalone backend (`vocoder/vocos/pretrained.py`);
        here it is wired directly into the tts() pipeline (BASELINE.md
        config 4)."""
        self.compute_dtype = compute_dtype
        self.vocoder_type = vocoder_type
        self.model = FastPitchTTS(model_sd_path, config=config,
                                  arabic_in=arabic_in, vowelizer=vowelizer,
                                  seed=seed)
        if vocoder_type == "vocos":
            from ..vocoder.vocos import CONFIG_22K, MelVocosModule
            from ..models.torch_import import vocos_params_from_torch
            cfg = CONFIG_22K
            self._sample_rate = cfg["sample_rate"]
            self._hop = cfg["hop_length"]
            self.vocoder = MelVocosModule(
                **{k: v for k, v in cfg.items() if k != "sample_rate"})
            if vocoder_sd is not None:
                sd = load_torch_state_dict(vocoder_sd)
                sd.pop("__extras__", None)
                self.vocoder_vars = vocos_params_from_torch(
                    sd, cfg["num_layers"])
            else:
                self.vocoder_vars = self.vocoder.init(
                    jax.random.PRNGKey(seed + 1),
                    jnp.zeros((1, 16, cfg["n_mels"])))
            self.bias_spec = jax.jit(
                lambda v: self.vocoder.apply(
                    v, method=type(self.vocoder).bias_vector)
            )(self.vocoder_vars)
        else:
            if vocoder_config is not None:
                self.vocoder_config = HiFiGANConfig.from_json(vocoder_config)
            else:
                self.vocoder_config = HiFiGANConfig()
            self._sample_rate = self.vocoder_config.sampling_rate
            self._hop = self.vocoder_config.hop_length
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
                lambda v: denoiser_mod.compute_bias_spec(self.vocoder.apply,
                                                         v)
            )(self.vocoder_vars)
        self._wave_jit = jax.jit(self._wave_fn,
                                 static_argnames=("max_frames",
                                                  "use_denoiser",
                                                  "return_mel", "out_int16"))

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    @property
    def hop_length(self) -> int:
        return self._hop

    def _wave_fn(self, fp_vars, voc_vars, bias_spec, enc_out, durations,
                 denoise_strength, pace, *, max_frames, use_denoiser,
                 return_mel=False, out_int16=False):
        from ..vocoder.hifigan import chunked_vocode
        dt = self.compute_dtype
        if dt is not None:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(dt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            fp_vars, voc_vars, enc_out = (cast(fp_vars), cast(voc_vars),
                                          enc_out.astype(dt))
        mel, mel_lens = self.model._decode_fn(fp_vars, enc_out, durations,
                                              pace, max_frames=max_frames)
        if self.vocoder_type == "vocos":
            # MelVocos fuses spectral denoising into its head; its ConvNeXt
            # receptive field is ~±27 frames, so a 32-frame overlap keeps
            # chunked == full
            strength = denoise_strength if use_denoiser else 0.0
            apply = lambda v, m: self.vocoder.apply(
                v, m, bias_spec.astype(m.dtype), strength)
            wave = chunked_vocode(apply, voc_vars, mel, core=192, overlap=32,
                                  pad_value=LOG_MEL_PAD)
            wave = wave.astype(jnp.float32)
        else:
            wave = chunked_vocode(self.vocoder.apply, voc_vars, mel,
                                  pad_value=LOG_MEL_PAD)
            wave = wave.astype(jnp.float32)
            if use_denoiser:
                wave = denoiser_mod.denoise(wave, bias_spec,
                                            denoise_strength)
        if out_int16:
            # device-side int16 conversion halves the D2H transfer — the
            # tunnel bandwidth is the serving bottleneck, and wav files are
            # int16 anyway
            wave = (jnp.clip(wave, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        mel = mel.astype(jnp.float32) if return_mel else None
        return wave, mel, mel_lens

    def _launch_batch(self, batch, speed, speaker_id, denoise, vowelizer,
                      pitch_mul, pitch_add, return_mel, pad_to,
                      out_int16=False):
        """Sweeps 1+2: tokenize, encode, pick bucket, launch the wave jit
        (async). Returns device handles + bookkeeping."""
        m = self.model
        ids_list = [m.tokenize(t, vowelizer) for t in batch]
        enc, inverse, n_real = m._encode_batch(
            ids_list, speaker_id, pitch_mul, pitch_add, pad_to)
        dur = np.asarray(enc["dur_pred"])
        dec_lens = np.floor(dur / float(speed) + 0.5).astype(np.int64).sum(1)
        bucket = _pick_mel_bucket(int(dec_lens.max()))
        wave, mel, mel_lens = self._wave_jit(
            m.variables, self.vocoder_vars, self.bias_spec,
            enc["enc_out"], enc["dur_pred"],
            jnp.float32(denoise), jnp.float32(speed), max_frames=bucket,
            use_denoiser=denoise > 0, return_mel=return_mel,
            out_int16=out_int16)
        return wave, mel, mel_lens, inverse

    def _collect_batch(self, handles, return_mel, out_int16=False):
        """Sweep 3: fetch device results, crop, unsort."""
        wave, mel, mel_lens, inverse = handles
        wave = np.asarray(wave)
        mel_lens = np.asarray(mel_lens)
        hop = self.hop_length
        waves = [wave[i, : mel_lens[i] * hop] for i in inverse]
        if return_mel:
            mel = np.asarray(mel)
            mels = [mel[i, : mel_lens[i]].T for i in inverse]
            return waves, mels
        return waves

    def tts_batch(self, batch: List[str], speed: float = 1.0,
                  speaker_id: int = 0, denoise: float = 0.0,
                  vowelizer: Optional[str] = None, pitch_mul: float = 1.0,
                  pitch_add: float = 0.0, return_mel: bool = False,
                  pad_to=None, out_int16: bool = False):
        handles = self._launch_batch(batch, speed, speaker_id, denoise,
                                     vowelizer, pitch_mul, pitch_add,
                                     return_mel, pad_to, out_int16)
        return self._collect_batch(handles, return_mel, out_int16)

    def tts_single(self, utterance: str, **kw):
        out = self.tts_batch([utterance], **kw)
        if kw.get("return_mel"):
            return out[0][0], out[1][0]
        return out[0]

    def tts(self, text_input: Union[str, List[str]], speed: float = 1.0,
            denoise: float = 0.005, speaker_id: int = 0, batch_size: int = 2,
            vowelizer: Optional[str] = None, pitch_mul: float = 1.0,
            pitch_add: float = 0.0, return_mel: bool = False,
            out_int16: bool = False):
        """Synthesize speech (API parity with reference
        `FastPitch2Wave.tts`, networks.py:352-435).

        Returns waveform(s) as numpy float32 [n_samples] at 22050 Hz.
        """
        kw = dict(speed=speed, denoise=denoise, speaker_id=speaker_id,
                  vowelizer=vowelizer, pitch_mul=pitch_mul,
                  pitch_add=pitch_add, return_mel=return_mel)
        if isinstance(text_input, str):
            return self.tts_single(text_input, **kw)
        # GLOBAL length sort before batching: batches become homogeneous in
        # length, so per-batch bucket padding waste drops from up to ~3x (on
        # mixed corpora) to the bucket granularity. The reference sorts only
        # within each batch (networks.py:16-35). Batches are LAUNCHED ahead
        # of collection (sweep pipeline) so D2H transfers of batch k overlap
        # the TPU compute of batch k+1.
        launch_kw = dict(kw)
        launch_kw.pop("return_mel")
        order = sorted(range(len(text_input)),
                       key=lambda i: -len(text_input[i]))
        waves = [None] * len(text_input)
        mels = [None] * len(text_input)
        bs = max(batch_size, 1)
        batches = [order[k: k + bs] for k in range(0, len(order), bs)]
        handles = [
            (idxs, self._launch_batch([text_input[i] for i in idxs],
                                      launch_kw["speed"],
                                      launch_kw["speaker_id"],
                                      launch_kw["denoise"],
                                      launch_kw["vowelizer"],
                                      launch_kw["pitch_mul"],
                                      launch_kw["pitch_add"], return_mel,
                                      pad_to=bs, out_int16=out_int16))
            for idxs in batches
        ]
        for idxs, h in handles:
            out = self._collect_batch(h, return_mel, out_int16)
            batch_waves, batch_mels = (out if return_mel else (out, None))
            for j, i in enumerate(idxs):
                waves[i] = batch_waves[j]
                if return_mel:
                    mels[i] = batch_mels[j]
        return (waves, mels) if return_mel else waves
