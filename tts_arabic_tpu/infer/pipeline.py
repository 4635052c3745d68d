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
import logging
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


from ..runtime.utils import cast_floating  # noqa: F401  (canonical home;
# re-exported here because the pipelines are its main consumer)

# stream() speculates its first chunk by decoding at this static bucket
# before the dec_len round trip lands (~24 s of speech covers nearly all
# utterances; longer ones fall back to the exact non-speculative path —
# the deep bucket costs only milliseconds of extra MXU decode time, far
# below the tunnel RTT it hides)
STREAM_SPEC_FRAMES = 2048


def _pick_mel_bucket(n: int) -> int:
    for b in MEL_BUCKETS:
        if n <= b:
            return b
    return _round_up(n, 1024)


def _default_vocoder_paths(vocoder_sd, vocoder_config, enabled=True):
    """When no vocoder weights are given, fall back to the basic config's
    `vocoder_state_path`/`vocoder_config_path` if those files exist —
    the reference wrappers load their vocoder from exactly these keys
    (configs/basic.yaml:19-20, `models/fastpitch/networks.py:262-276`).

    `enabled` should be False for seed-only pipelines (no acoustic-model
    checkpoint): silently substituting pretrained vocoder weights there
    would make results depend on whether pretrained/ happens to exist."""
    if vocoder_sd is not None or not enabled:
        return vocoder_sd, vocoder_config
    try:
        from ..runtime.config import get_basic_config
        bc = get_basic_config()
        p = bc.get_path("vocoder_state_path")
        if p.is_file():
            vocoder_sd = str(p)
            if vocoder_config is None:
                cp = bc.get_path("vocoder_config_path")
                if cp.is_file():
                    vocoder_config = str(cp)
            logging.getLogger(__name__).info(
                "vocoder weights defaulted to %s", vocoder_sd)
    except Exception:
        pass
    return vocoder_sd, vocoder_config


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
                 seed: int = 0, mesh=None, strict_text: bool = False):
        """mesh: optional `jax.sharding.Mesh` (see `parallel.make_mesh`) for
        data-parallel synthesis — params replicate, the batch axis shards
        across chips (the reference has no multi-device story, SURVEY.md
        §2.10; batched TTS is embarrassingly parallel so DP over ICI is the
        whole design). Single-chip is the degenerate 1-device case.

        strict_text: False (default) tokenizes any real-world sentence —
        tokens outside the symbol table (trailing '.'/'!' punctuation and
        the like) are dropped gracefully. True reproduces the reference's
        KeyError on unknown tokens bit-for-bit (reference
        `text/__init__.py:24-27`) for bug-parity testing."""
        self.arabic_in = arabic_in
        self.strict_text = strict_text
        self.default_vowelizer = vowelizer
        self._vowelizers = {}
        self.phon_to_id = None
        self.mesh = mesh

        params = None
        if checkpoint is not None:
            params, config = self._load_checkpoint(checkpoint, config)
        self.config = config or FastPitchConfig()
        self.model = FastPitch(self.config)
        if params is None:
            tokens = jnp.zeros((1, 8), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), tokens,
                                     max_frames=16)
        if mesh is not None:
            from ..parallel import replicate
            params = replicate(params, mesh)
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
        ids = text_frontend.tokens_to_ids(tokens, self.phon_to_id,
                                          strict=self.strict_text)
        return np.asarray(ids, np.int32)

    def tokenize_batch(self, batch: List[str],
                       vowelizer: Optional[str] = None) -> List[np.ndarray]:
        """Tokenize a batch with ONE batched diacritizer forward when a
        vowelizer is active (the per-utterance path pays one LSTM-scan
        dispatch — and one compile per new char length — per sentence)."""
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
        return [np.asarray(text_frontend.tokens_to_ids(
            to_tokens(v, append_space=False), self.phon_to_id,
            strict=self.strict_text), np.int32)
            for v in vowelized]

    # -- jitted phases -------------------------------------------------------

    def _encode_fn(self, variables, tokens, pitch_mul, pitch_add, speaker,
                   pace=1.0, *, max_duration=75.0):
        """pitch_mul/pitch_add/speaker are dynamic scalars: changing the
        control values never recompiles (only new bucket shapes do).

        fp32 matmuls: the TPU MXU's default bf16 passes perturb predicted
        durations enough to flip round() at frame boundaries, making output
        lengths differ from the fp32 reference. The encode phase is a tiny
        fraction of end-to-end FLOPs (decode+vocoder dominate), so full
        precision here buys deterministic CPU/TPU-identical durations for
        free.

        dec_lens / dec_len_max are computed ON DEVICE (with the same
        floor(dur/pace + 0.5) rounding `regulate_len` uses) so the host only
        fetches one i32 scalar to pick the mel bucket — over the tunnel,
        fetching the full [B, T] duration array per batch was the single
        largest launch cost."""
        with jax.default_matmul_precision("float32"):
            enc = self.model.apply(
                variables, tokens, speaker=speaker,
                pitch_mul=pitch_mul, pitch_add=pitch_add,
                max_duration=max_duration, method=FastPitch.encode_infer)
        reps = jnp.floor(enc["dur_pred"] / pace + 0.5)
        enc["dec_lens"] = jnp.sum(reps, axis=1).astype(jnp.int32)
        enc["dec_len_max"] = jnp.max(enc["dec_lens"])
        return enc

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
                      pad_to=None, speed=1.0):
        """Sort + pad + dispatch phase-A (ASYNC — no host sync); returns
        (enc, inverse order, n_real). Batch rows are padded to `pad_to` so
        partial batches reuse the full batch's compiled signature."""
        n_real = len(ids_list)
        lens = np.asarray([len(x) for x in ids_list])
        order = np.argsort(-lens)
        ids_sorted = [ids_list[i] for i in order]
        rows = pad_to if pad_to is not None else n_real
        if self.mesh is not None:  # batch axis must divide the mesh
            rows += (-rows) % self.mesh.devices.size
        if n_real < rows:
            ids_sorted += [np.zeros(1, np.int32)] * (rows - n_real)
        tokens = _pad_ids(ids_sorted, _round_up(max(int(lens.max()), 1),
                                                TEXT_BUCKET))
        tokens = jnp.asarray(tokens)
        if self.mesh is not None:
            from ..parallel import batch_sharded
            tokens = jax.device_put(tokens, batch_sharded(self.mesh))
        enc = self._encode_jit(self.variables, tokens,
                               jnp.float32(pitch_mul),
                               jnp.float32(pitch_add),
                               jnp.int32(speaker_id),
                               jnp.float32(speed))
        inverse = np.argsort(order)
        return enc, inverse, n_real

    def _infer_batch_mel(self, ids_list, speed, speaker_id, pitch_mul,
                         pitch_add, pad_to=None):
        """Core batched mel synthesis; returns (mel [B,F,80], lens, inverse,
        bucket)."""
        enc, inverse, n_real = self._encode_batch(
            ids_list, speaker_id, pitch_mul, pitch_add, pad_to, speed)
        # one i32 scalar sync picks the mel bucket
        bucket = _pick_mel_bucket(int(enc["dec_len_max"]))
        mel, mel_lens = self._decode_jit(
            self.variables, enc["enc_out"], enc["dur_pred"],
            jnp.float32(speed), max_frames=bucket)
        return mel, np.asarray(mel_lens), inverse, bucket

    # -- public API ----------------------------------------------------------

    def ttmel_batch(self, batch: List[str], speed: float = 1.0,
                    speaker_id: int = 0, vowelizer: Optional[str] = None,
                    pitch_mul: float = 1.0, pitch_add: float = 0.0,
                    pad_to=None):
        ids_list = self.tokenize_batch(batch, vowelizer)
        mel, mel_lens, inverse, _ = self._infer_batch_mel(
            ids_list, speed, speaker_id, pitch_mul, pitch_add, pad_to)
        mel = np.asarray(mel)
        return [mel[i, : mel_lens[i]].T for i in inverse]  # [80, T] each

    def ttmel_single(self, utterance: str, **kw):
        return self.ttmel_batch([utterance], **kw)[0]

    # crop granularity for device-side mel trims before D2H (see
    # FastPitch2Wave._CROP_FRAMES)
    _CROP_FRAMES = 64

    def ttmel(self, text_input: Union[str, List[str]], speed: float = 1.0,
              speaker_id: int = 0, batch_size: int = 1,
              vowelizer: Optional[str] = None, pitch_mul: float = 1.0,
              pitch_add: float = 0.0):
        kw = dict(speed=speed, speaker_id=speaker_id, vowelizer=vowelizer,
                  pitch_mul=pitch_mul, pitch_add=pitch_add)
        if isinstance(text_input, str):
            return self.ttmel_single(text_input, **kw)
        # same sweep pipeline as FastPitch2Wave.tts: global length sort, all
        # encodes dispatched before the first bucket sync, one device_get
        # for every batch's bucket scalar, decodes dispatched async, one
        # device_get for all mels (device-side cropped to cut D2H)
        order = sorted(range(len(text_input)),
                       key=lambda i: -len(text_input[i]))
        bs = max(batch_size, 1)
        batches = [order[k: k + bs] for k in range(0, len(order), bs)]
        encs = [
            self._encode_batch(
                self.tokenize_batch([text_input[i] for i in idxs],
                                    vowelizer),
                speaker_id, pitch_mul, pitch_add, bs, speed)
            for idxs in batches
        ]
        maxes = jax.device_get([enc[0]["dec_len_max"] for enc in encs])
        handles = []
        for (enc, inverse, _), mx in zip(encs, maxes):
            bucket = _pick_mel_bucket(int(mx))
            mel, mel_lens = self._decode_jit(
                self.variables, enc["enc_out"], enc["dur_pred"],
                jnp.float32(speed), max_frames=bucket)
            crop = min(_round_up(int(mx), self._CROP_FRAMES), bucket)
            handles.append((mel[:, :crop], mel_lens, inverse))
        fetched = jax.device_get([(h[0], h[1]) for h in handles])
        out = [None] * len(text_input)
        for idxs, (mel, lens), h in zip(batches, fetched, handles):
            for j, i in enumerate(idxs):
                k = h[2][j]
                out[i] = mel[k, : lens[k]].T
        return out


# default int8 calibration texts (ASC corpus sentences, long and
# phoneme-diverse so MRF activations span their serving dynamic range;
# same sentences in both input modes — data/test_arab.txt line 1 /
# data/infer_test.txt lines 1-3)
_INT8_CALIB_ARABIC = [
    "أَتاحَت لِلبائِعِ لمُتَجَوِّلِ أَن يَكُونَ جاذِبَن لِلمُواطِنِ لأَقَلِّ دَخلَن",
    "أَحرَزَت مُنتَخَباتُ لبَرازِيلِ وَألمانيا وَرُوسيا فَوزَن فِي مُقابَلاتِهِم"
    " لإِعدادِيَّةِ لَّتِي أُقِيمَت ِستِعدادَن لِنِهائِيّاتِ كَأسِ لعالَم",
    "إِذ سَيَحضُرُ لِقاءَ هَذا لعامِ خَمسُن وَثَلاثُونَ مِنهُم",
]
_INT8_CALIB_BUCKWALTER = [
    ">atAHat lilbA}iEi lmutajaw~ili >an yakuwna jA*iban lilmuwATini"
    " l>aqal~i daxlan",
    ">aHrazat muntaxabAtu lbarAziyli wa>lmAnyA waruwsyA fawzan fiy"
    " muqAbalAtihim l<iEdAdiy~api",
    "<i* sayaHDuru liqAa ha*A lEAmi xamsun wa^alA^uwna minhum",
]


class FastPitch2Wave:
    """End-to-end text -> waveform (reference `FastPitch2Wave` equivalent),
    with the vocoder + denoiser fused into the phase-B jit."""

    def __init__(self, model_sd_path=None, vocoder_sd=None,
                 vocoder_config=None, vowelizer: Optional[str] = None,
                 arabic_in: bool = True, config=None, seed: int = 0,
                 compute_dtype=None, vocoder_type: str = "hifigan",
                 mesh=None, mrf_strategy: str = "auto",
                 strict_text: bool = False,
                 quantize: Optional[str] = None):
        """compute_dtype: jnp.bfloat16 runs the decoder+vocoder hot path on
        the MXU's native bf16 (~2x on TPU); weights stay fp32 in memory and
        are cast at trace time; the spectral denoiser stays fp32. None =
        full fp32.

        vocoder_type: "hifigan" (default) or "vocos" — the reference only
        exposes Vocos as a standalone backend (`vocoder/vocos/pretrained.py`);
        here it is wired directly into the tts() pipeline (BASELINE.md
        config 4).

        mrf_strategy: HiFi-GAN MRF ResBlock implementation on TPU —
        "auto" (default: the packed-lane XLA rewrite at 32 channels,
        measured 58.1 vs 25.9 TF/s for its stage with no extra warmup —
        docs/PERF.md; plain flax apply at C >= 64 where XLA's own conv
        schedule already sustains ~93 TF/s), "xla" (plain flax apply
        everywhere), "packed_xla" (force the lane-packing rewrite
        wherever 128 % C == 0), or "unfold"/"packed" (the Mosaic Pallas
        kernels: benchmark/debug only — "packed" wins its stage but
        costs ~6x warmup through the remote Mosaic compiler). Off-TPU or
        for non-ResBlock1 checkpoints the plain flax apply is always
        used.

        quantize: None (default) or "int8" — static-calibrated int8 for
        the dense HiFi-GAN MRF stages (int8 runs the MXU at double rate;
        measured 1.28-1.85x on those convs, docs/PERF.md r5). Calibration
        runs automatically in this constructor on a built-in text set;
        call `calibrate_int8(texts=...)` afterwards to recalibrate on
        deployment-representative text. PTQ-grade accuracy (~40 dB
        waveform SNR vs the float path). The reference serves fp32 only."""
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}; "
                             "supported: 'int8'")
        self.compute_dtype = compute_dtype
        self.vocoder_type = vocoder_type
        self.model = FastPitchTTS(model_sd_path, config=config,
                                  arabic_in=arabic_in, vowelizer=vowelizer,
                                  seed=seed, mesh=mesh,
                                  strict_text=strict_text)
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
                # init under jit: complex ISTFT ops fail eagerly on TPU
                self.vocoder_vars = jax.jit(self.vocoder.init)(
                    jax.random.PRNGKey(seed + 1),
                    jnp.zeros((1, 16, cfg["n_mels"])))
            self.bias_spec = jax.jit(
                lambda v: self.vocoder.apply(
                    v, method=type(self.vocoder).bias_vector)
            )(self.vocoder_vars)
        else:
            vocoder_sd, vocoder_config = _default_vocoder_paths(
                vocoder_sd, vocoder_config,
                enabled=model_sd_path is not None)
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
        self._voc_apply = self.vocoder.apply
        self._voc_strategy = "xla"
        if (vocoder_type == "hifigan" and mrf_strategy != "xla"
                and self.vocoder_config.resblock == "1"
                and jax.devices()[0].platform == "tpu"):
            from ..ops.hifigan_pallas import generator_apply_pallas
            cfg = self.vocoder_config
            self._voc_strategy = mrf_strategy
            self._voc_apply = (
                lambda v, m: generator_apply_pallas(
                    v, m, cfg, strategy=mrf_strategy))
        if mesh is not None:
            from ..parallel import replicate
            self.vocoder_vars = replicate(self.vocoder_vars, mesh)
            self.bias_spec = replicate(self.bias_spec, mesh)
        self._int8_scales = None
        self._ffn_quant = None
        self._rebuild_wave_jit()
        if quantize == "int8":
            self.calibrate_int8()

    def _rebuild_wave_jit(self):
        """(Re)create the wave jit around a FRESH closure: bound methods of
        one object compare/hash equal, so re-jitting `self._wave_fn` after
        `_voc_apply` changed would silently reuse the old trace (the same
        collision fixed in eval/gate_control.py)."""
        fn = lambda *a, **kw: self._wave_fn(*a, **kw)  # noqa: E731
        self._wave_jit = jax.jit(fn, static_argnames=("max_frames",
                                                      "use_denoiser",
                                                      "return_mel",
                                                      "out_int16"))
        if hasattr(self, "_stream_jit"):
            del self._stream_jit  # lazily rebuilt with the new _voc_apply

    def calibrate_int8(self, texts: Optional[List[str]] = None, mels=None,
                       min_ch: int = 64, margin: float = 1.0, ffn="auto"):
        """Switch the serving path to static-calibrated int8: the HiFi-GAN
        MRF stages (>= min_ch channels) and — when calibrating from texts —
        the decoder FFT ConvFFN convs (measured 1.75x on the MXU at their
        shapes, docs/PERF.md r5; encoder/duration/pitch heads stay float,
        so predicted durations and mel lengths are unchanged).

        Calibrates per-conv activation scales from `mels` ([B, T, 80] array
        or list of them), or from mels synthesized by this model for
        `texts` (default: a built-in phoneme-diverse set). Scales become
        trace-time constants of a freshly-built wave jit; tts()/stream()
        pick them up immediately. Returns the vocoder scales dict. HiFi-GAN
        ResBlock1 checkpoints only (Vocos/ResBlock2 have no measured int8
        win). ffn: True/False/"auto" ("auto" = quantize the decoder FFN
        when text calibration is possible; requires scan_layers=False)."""
        if self.vocoder_type != "hifigan":
            raise ValueError("int8 quantization covers the HiFi-GAN path")
        if self.vocoder_config.resblock != "1":
            raise ValueError("int8 quantization covers ResBlock1 configs")
        from ..ops.hifigan_int8 import (collect_mrf_scales,
                                        generator_apply_int8)
        m = self.model
        dt = self.compute_dtype
        if ffn == "auto":
            ffn = mels is None and not m.config.scan_layers
        if ffn and mels is not None:
            raise ValueError("decoder-FFN calibration needs the texts path "
                             "(pass texts=..., or ffn=False with mels=...)")
        if ffn and m.config.scan_layers:
            raise ValueError("decoder-FFN int8 is unavailable under "
                             "scan_layers=True")
        ffn_quant = None
        if mels is None:
            batch = texts or (_INT8_CALIB_ARABIC if m.arabic_in
                              else _INT8_CALIB_BUCKWALTER)
            ids = m.tokenize_batch(list(batch), None)
            if ffn:
                # one calibration decode with the "calib" collection
                # mutable: sows max-abs at every decoder ConvFFN conv input
                # AND yields the mels for the vocoder calibration below
                enc, _, _ = m._encode_batch(ids, 0, 1.0, 0.0, None, 1.0)
                bucket = _pick_mel_bucket(int(enc["dec_len_max"]))
                fp_vars = (m.variables if dt is None
                           else cast_floating(m.variables, dt))
                enc_out = (enc["enc_out"] if dt is None
                           else enc["enc_out"].astype(dt))

                def _calib_decode(v, e, d):
                    (mel, lens), aux = m.model.apply(
                        v, e, d, bucket, 1.0, method=FastPitch.decode,
                        mutable=["calib"])
                    frame_ids = jnp.arange(bucket)[None, :, None]
                    mel = jnp.where(frame_ids < lens[:, None, None], mel,
                                    LOG_MEL_PAD)
                    return mel, aux["calib"]["decoder"]

                mel, calib = jax.jit(_calib_decode)(fp_vars, enc_out,
                                                    enc["dur_pred"])
                calib = jax.device_get(calib)
                ffn_quant = {"decoder": {
                    layer: {"ff": {"ffn_ascale": jnp.asarray(
                        [max(float(c["ff"]["ffn_amax1"]), 1e-12)
                         * margin / 127.0,
                         max(float(c["ff"]["ffn_amax2"]), 1e-12)
                         * margin / 127.0], jnp.float32)}}
                    for layer, c in calib.items()}}
            else:
                mel, _, _, _ = m._infer_batch_mel(ids, 1.0, 0, 1.0, 0.0)
            mels = [mel]
        elif hasattr(mels, "ndim"):
            mels = [mels]
        voc_vars = (self.vocoder_vars if dt is None
                    else cast_floating(self.vocoder_vars, dt))
        mels = [jnp.asarray(x) if dt is None else jnp.asarray(x).astype(dt)
                for x in mels]
        scales = collect_mrf_scales(voc_vars, mels, self.vocoder_config,
                                    min_ch=min_ch, margin=margin)
        cfg, strategy = self.vocoder_config, self._voc_strategy
        self._voc_apply = (
            lambda v, m_: generator_apply_int8(v, m_, cfg, scales,
                                               min_ch=min_ch,
                                               strategy=strategy))
        self._int8_scales = scales
        self._ffn_quant = ffn_quant
        self._rebuild_wave_jit()
        return scales

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
            fp_vars, voc_vars, enc_out = (cast_floating(fp_vars, dt),
                                          cast_floating(voc_vars, dt),
                                          enc_out.astype(dt))
        if self._ffn_quant is not None:  # int8 decoder FFN (calibrate_int8)
            fp_vars = {**fp_vars, "quant": self._ffn_quant}
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
            wave = chunked_vocode(self._voc_apply, voc_vars, mel,
                                  pad_value=LOG_MEL_PAD)
            wave = wave.astype(jnp.float32)
            if use_denoiser:
                wave = denoiser_mod.denoise(wave, bias_spec,
                                            denoise_strength)
        if out_int16 == "mulaw":
            # 8-bit G.711-style companding on device: quarter of f32 D2H,
            # telephony-grade (~38 dB); decode with audio.mulaw_decode
            from ..audio import mulaw_encode
            wave = mulaw_encode(wave)
        elif out_int16:
            # device-side int16 conversion halves the D2H transfer — the
            # tunnel bandwidth is the serving bottleneck, and wav files are
            # int16 anyway
            wave = (jnp.clip(wave, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        mel = mel.astype(jnp.float32) if return_mel else None
        return wave, mel, mel_lens

    def _dispatch_encode(self, batch, speed, speaker_id, vowelizer,
                         pitch_mul, pitch_add, pad_to):
        """Sweep 1: tokenize + dispatch phase-A (async, no host sync)."""
        m = self.model
        ids_list = m.tokenize_batch(batch, vowelizer)
        return m._encode_batch(ids_list, speaker_id, pitch_mul, pitch_add,
                               pad_to, speed)

    def _dispatch_wave(self, enc_handles, speed, denoise, return_mel,
                       out_int16=False, dec_len_max=None):
        """Sweep 2: one i32 scalar sync picks the mel bucket, then the wave
        jit is dispatched (async). Kept separate from sweep 1 so all encode
        programs are in flight before the first bucket sync — over the
        tunnel, each sync costs a round trip, and overlapping them with the
        other batches' encode compute is most of the launch win.

        dec_len_max: pre-fetched scalar (the multi-batch path fetches every
        batch's in one device_get); None fetches it here."""
        m = self.model
        enc, inverse, n_real = enc_handles
        if dec_len_max is None:
            dec_len_max = int(enc["dec_len_max"])
        bucket = _pick_mel_bucket(dec_len_max)
        wave, mel, mel_lens = self._wave_jit(
            m.variables, self.vocoder_vars, self.bias_spec,
            enc["enc_out"], enc["dur_pred"],
            jnp.float32(denoise), jnp.float32(speed), max_frames=bucket,
            use_denoiser=denoise > 0, return_mel=return_mel,
            out_int16=out_int16)
        return wave, mel, mel_lens, inverse

    def _launch_batch(self, batch, speed, speaker_id, denoise, vowelizer,
                      pitch_mul, pitch_add, return_mel, pad_to,
                      out_int16=False):
        """Sweeps 1+2 for a single batch."""
        enc_handles = self._dispatch_encode(batch, speed, speaker_id,
                                            vowelizer, pitch_mul, pitch_add,
                                            pad_to)
        return self._dispatch_wave(enc_handles, speed, denoise, return_mel,
                                   out_int16)

    # crop granularity (frames) for device-side trims before D2H: coarse
    # enough to keep the set of tiny slice programs bounded, fine enough to
    # cut most mel-bucket padding out of the transfer (the tunnel's
    # ~40 MB/s D2H is the serving bottleneck)
    _CROP_FRAMES = 64

    def _crop_device(self, handles, mel_lens_np):
        """Device-side trim of wave (and mel) to the batch's real length
        rounded up to _CROP_FRAMES, so the D2H transfer skips bucket
        padding. Returns new handles (still device arrays, async)."""
        wave, mel, mel_lens, inverse = handles
        hop = self.hop_length
        frames = _round_up(int(mel_lens_np.max()), self._CROP_FRAMES)
        if frames * hop < wave.shape[1]:
            wave = wave[:, : frames * hop]
            if mel is not None:
                mel = mel[:, :frames]
        return wave, mel, mel_lens, inverse

    def _split_batch(self, wave, mel, mel_lens_np, inverse, return_mel):
        """Crop fetched arrays per sample and unsort."""
        hop = self.hop_length
        waves = [wave[i, : mel_lens_np[i] * hop] for i in inverse]
        if return_mel:
            mels = [mel[i, : mel_lens_np[i]].T for i in inverse]
            return waves, mels
        return waves

    def _collect_batch(self, handles, return_mel, out_int16=False):
        """Sweep 3: fetch device results, crop, unsort."""
        mel_lens_np = np.asarray(handles[2])
        wave, mel, _, inverse = self._crop_device(handles, mel_lens_np)
        wave = np.asarray(wave)
        if return_mel:
            mel = np.asarray(mel)
        return self._split_batch(wave, mel, mel_lens_np, inverse, return_mel)

    def _collect_many(self, handles_list, return_mel):
        """Batched sweep 3 over several batches: ONE device_get over every
        buffer at once, so each batch's D2H transfer starts the moment its
        program finishes and overlaps the later batches' compute (a
        pre-fetch of length vectors to crop the buffers measured slower: it
        serializes all compute before the first big transfer, and batch-max
        cropping only trims the bucket-to-max gap, ~10%)."""
        fetched = jax.device_get([
            (h[0], h[1] if return_mel else None, h[2])
            for h in handles_list
        ])
        return [
            self._split_batch(w, m, lens, h[3], return_mel)
            for (w, m, lens), h in zip(fetched, handles_list)
        ]

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

    # -- streaming synthesis ---------------------------------------------

    def _stream_chunk_fn(self, voc_vars, bias_spec, mel, start,
                         denoise_strength, *, window, use_denoiser,
                         out_int16):
        """Vocode (+denoise) one `window`-frame slice of the decoded mel.
        `start` is a traced scalar: every chunk of a stream reuses one
        compiled program."""
        dt = self.compute_dtype
        if dt is not None:
            voc_vars, mel = cast_floating(voc_vars, dt), mel.astype(dt)
        piece = jax.lax.dynamic_slice_in_dim(mel, start, window, axis=1)
        if self.vocoder_type == "vocos":
            strength = denoise_strength if use_denoiser else 0.0
            wave = self.vocoder.apply(voc_vars, piece,
                                      bias_spec.astype(piece.dtype), strength)
        else:
            # same apply as tts() so streamed chunks match batch output
            wave = self._voc_apply(voc_vars, piece)
            if use_denoiser:
                wave = denoiser_mod.denoise(wave.astype(jnp.float32),
                                            bias_spec, denoise_strength)
        wave = wave.astype(jnp.float32)
        if out_int16 == "mulaw":
            from ..audio import mulaw_encode
            wave = mulaw_encode(wave)
        elif out_int16:
            wave = (jnp.clip(wave, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        return wave

    def stream(self, utterance: str, chunk_frames: int = 128,
               overlap: int = 16, speed: float = 1.0, denoise: float = 0.005,
               speaker_id: int = 0, vowelizer: Optional[str] = None,
               pitch_mul: float = 1.0, pitch_add: float = 0.0,
               out_int16: bool = False):
        """Streaming synthesis: yields waveform chunks (np arrays,
        `chunk_frames*hop` samples each, final one shorter) as soon as each
        is vocoded — first-audio latency is one chunk instead of the whole
        utterance. The reference has no streaming story.

        Matches `tts_single` to float tolerance: the full mel is decoded up
        front in the same compute dtype (the parallel decoder is cheap;
        only vocoding is streamed), and each window carries `overlap` >=
        the HiFi-GAN receptive field (~13 frames) + the denoiser's STFT
        context (4 frames), with the core cut out overlap-discard style.
        Window starts are multiples of the hop so the denoiser's STFT
        frame grid aligns with the full-wave grid."""
        m = self.model
        ids = m.tokenize(utterance, vowelizer)
        enc, _, _ = m._encode_batch([ids], speaker_id, pitch_mul, pitch_add,
                                    None, speed)
        window = chunk_frames + 2 * overlap
        fp_vars, enc_out = m.variables, enc["enc_out"]
        if self.compute_dtype is not None:  # same decode dtype as _wave_fn
            dt = self.compute_dtype
            fp_vars, enc_out = (cast_floating(fp_vars, dt),
                                enc_out.astype(dt))
        if self._ffn_quant is not None:  # same int8 decoder FFN as _wave_fn
            fp_vars = {**fp_vars, "quant": self._ffn_quant}
        if not hasattr(self, "_stream_jit"):
            # fresh closure, not the bound method: a recalibration
            # (calibrate_int8) deletes this wrapper, and re-jitting the
            # bound method would reuse the stale trace cache
            self._stream_jit = jax.jit(
                lambda *a, **kw: self._stream_chunk_fn(*a, **kw),
                static_argnames=("window", "use_denoiser", "out_int16"))

        # FIRST chunk is dispatched speculatively BEFORE the dec_len fetch:
        # decode at a deep static bucket (spec_frames ~12 s of speech —
        # milliseconds of MXU time) and vocode window 0 from it, so the
        # device work overlaps the scalar's tunnel round trip (a serialized
        # RTT in the old path — directly off time-to-first-audio). The
        # decoder masks attention at dec_lens, so the speculative mel is
        # IDENTICAL to the final-bucket decode whenever dec_len <=
        # spec_frames' bucket (then it simply becomes the final mel);
        # longer utterances discard the speculation and take the old exact
        # path at no extra latency (the wasted programs were async).
        bucket0 = _pick_mel_bucket(max(window, STREAM_SPEC_FRAMES))
        mel0, _ = m._decode_jit(fp_vars, enc_out, enc["dur_pred"],
                                jnp.float32(speed), max_frames=bucket0)
        wave0 = self._stream_jit(
            self.vocoder_vars, self.bias_spec, mel0, jnp.int32(0),
            jnp.float32(denoise), window=window,
            use_denoiser=denoise > 0, out_int16=out_int16)

        # ONE batched transfer for the scalar AND the speculative chunk:
        # fetching them separately costs two serialized tunnel RTTs (the
        # wave0 bytes are ~160 KB — negligible next to an RTT, even when
        # the speculation is discarded)
        dec_len_a, wave0_np = jax.device_get((enc["dec_len_max"], wave0))
        dec_len = int(dec_len_a)
        # mel frames are bucket-invariant wherever the stream reads them:
        # the decoder masks attention keys at dec_lens and every consumed
        # window stays >= a conv receptive field away from the bucket's
        # pad boundary when dec_len + window fits — so the speculative
        # deep-bucket mel IS the mel, for the whole stream (empirically
        # gated by test_stream_equals_tts_single, which compares against
        # tts_single's tighter-bucket decode)
        speculation_ok = dec_len + window <= bucket0
        if speculation_ok:
            mel, bucket = mel0, bucket0
        else:
            bucket = _pick_mel_bucket(max(dec_len, window))
            mel, _ = m._decode_jit(fp_vars, enc_out, enc["dur_pred"],
                                   jnp.float32(speed), max_frames=bucket)
        hop = self.hop_length
        n_chunks = max(-(-dec_len // chunk_frames), 1)
        for i in range(n_chunks):
            if i == 0 and speculation_ok:
                core_len = min(chunk_frames, dec_len)
                yield wave0_np[0, : core_len * hop]
                continue
            start = int(np.clip(i * chunk_frames - overlap, 0,
                                bucket - window))
            core_off = i * chunk_frames - start
            wave_w = self._stream_jit(
                self.vocoder_vars, self.bias_spec, mel, jnp.int32(start),
                jnp.float32(denoise), window=window,
                use_denoiser=denoise > 0, out_int16=out_int16)
            core_len = min(chunk_frames, dec_len - i * chunk_frames)
            yield np.asarray(
                wave_w[0, core_off * hop: (core_off + core_len) * hop])

    def warmup(self, batch_sizes=(2,), text_buckets=(16, 32),
               mel_buckets=(256, 512, 1024), denoise: float = 0.005,
               return_mel: bool = False, out_int16: bool = False):
        """Precompile the jit signatures a serving deployment will hit, so
        no request pays first-compile latency (compilations also land in
        the persistent cache, surviving restarts). Compiles |batch_sizes| x
        |text_buckets| encode programs and x |mel_buckets| wave programs
        with zero inputs. Under a DP mesh, batch sizes round up to the
        mesh and tokens are batch-sharded, exactly like real requests."""
        m = self.model
        for bs in batch_sizes:
            for tb in text_buckets:
                if m.mesh is not None:
                    from ..parallel import batch_sharded
                    bs = bs + (-bs) % m.mesh.devices.size
                    tokens = jax.device_put(jnp.zeros((bs, tb), jnp.int32),
                                            batch_sharded(m.mesh))
                else:
                    tokens = jnp.zeros((bs, tb), jnp.int32)
                enc = m._encode_jit(m.variables, tokens,
                                    jnp.float32(1.0), jnp.float32(0.0),
                                    jnp.int32(0), jnp.float32(1.0))
                for mb in mel_buckets:
                    self._wave_jit(
                        m.variables, self.vocoder_vars, self.bias_spec,
                        enc["enc_out"], enc["dur_pred"],
                        jnp.float32(denoise), jnp.float32(1.0),
                        max_frames=mb, use_denoiser=denoise > 0,
                        return_mel=return_mel, out_int16=out_int16)

    def tts(self, text_input: Union[str, List[str]], speed: float = 1.0,
            denoise: float = 0.005, speaker_id: int = 0, batch_size: int = 2,
            vowelizer: Optional[str] = None, pitch_mul: float = 1.0,
            pitch_add: float = 0.0, return_mel: bool = False,
            out_int16: bool = False):
        """Synthesize speech (API parity with reference
        `FastPitch2Wave.tts`, networks.py:352-435).

        Returns waveform(s) as numpy float32 [n_samples] at 22050 Hz.
        `out_int16`: False (float32) | True (int16, half the D2H) |
        "mulaw" (uint8 G.711-style companding on device, quarter of the
        f32 transfer; decode with `audio.mulaw_decode`).
        """
        kw = dict(speed=speed, denoise=denoise, speaker_id=speaker_id,
                  vowelizer=vowelizer, pitch_mul=pitch_mul,
                  pitch_add=pitch_add, return_mel=return_mel,
                  out_int16=out_int16)
        if isinstance(text_input, str):
            return self.tts_single(text_input, **kw)
        # GLOBAL length sort before batching: batches become homogeneous in
        # length, so per-batch bucket padding waste drops from up to ~3x (on
        # mixed corpora) to the bucket granularity. The reference sorts only
        # within each batch (networks.py:16-35). Batches are LAUNCHED ahead
        # of collection (sweep pipeline) so D2H transfers of batch k overlap
        # the TPU compute of batch k+1.
        order = sorted(range(len(text_input)),
                       key=lambda i: -len(text_input[i]))
        waves = [None] * len(text_input)
        mels = [None] * len(text_input)
        bs = max(batch_size, 1)
        batches = [order[k: k + bs] for k in range(0, len(order), bs)]
        # sweep 1: dispatch ALL encodes (async) before any host sync
        encs = [
            self._dispatch_encode([text_input[i] for i in idxs], speed,
                                  speaker_id, vowelizer, pitch_mul,
                                  pitch_add, pad_to=bs)
            for idxs in batches
        ]
        # sweep 2: ONE device_get for every batch's bucket scalar, then
        # wave-jit dispatches
        maxes = jax.device_get([enc[0]["dec_len_max"] for enc in encs])
        handles = [
            (idxs, self._dispatch_wave(enc, speed, denoise, return_mel,
                                       out_int16, dec_len_max=int(mx)))
            for idxs, enc, mx in zip(batches, encs, maxes)
        ]
        # sweep 3: batched two-phase collection
        outs = self._collect_many([h for _, h in handles], return_mel)
        for (idxs, _), out in zip(handles, outs):
            batch_waves, batch_mels = (out if return_mel else (out, None))
            for j, i in enumerate(idxs):
                waves[i] = batch_waves[j]
                if return_mel:
                    mels[i] = batch_mels[j]
        return (waves, mels) if return_mel else waves
