"""Vocos vocoder family (flax): ConvNeXt backbone + Fourier heads.

Re-implementation of the reference Vocos backend (`vocoder/vocos/`):
- `VocosBackbone`: embed conv k7 -> LayerNorm -> 8x ConvNeXtBlock (depthwise
  k7 -> LN -> pointwise 1536 -> GELU -> pointwise -> layer-scale gamma) ->
  final LN (`models.py:26-89`, `modules.py:8-60`); optional AdaLayerNorm
  conditioning (`modules.py:63-86`); `VocosResNetBackbone` alternative
  (`models.py:92-118`)
- heads: `ISTFTHead` (Linear -> exp-mag clip 1e2 / phase -> ISTFT,
  `heads.py:26-69`), `IMDCTSymExpHead`, `IMDCTCosHead` (`heads.py:72-164`)
- `MDCT`/`IMDCT` with FFT twiddles (`spectral_ops.py:78-192`)
- `MelVocos` inference wrapper with baked 22k/24k configs and the
  zero-mel denoising bias vector (`pretrained.py:34-97`), plus the generic
  `Vocos` feature-extractor/backbone/head composition (`pretrained.py:100-181`)

Native layout is feature-last [B, T, C]; depthwise + pointwise ops map
directly onto TPU conv/matmul units. Complex values stay inside the jit.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..audio.stft import istft
from ..audio.mel import slaney_mel_filterbank


def symlog(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


class AdaLayerNorm(nn.Module):
    """Per-class scale/shift LayerNorm (`modules.py:63-86`)."""
    num_embeddings: int
    dim: int

    @nn.compact
    def __call__(self, x, cond_id):
        scale = nn.Embed(self.num_embeddings, self.dim,
                         embedding_init=nn.initializers.ones,
                         name="scale")(cond_id)
        shift = nn.Embed(self.num_embeddings, self.dim,
                         embedding_init=nn.initializers.zeros,
                         name="shift")(cond_id)
        x = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False)(x)
        return x * scale[:, None, :] + shift[:, None, :]


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale_init_value: float
    adanorm_num_embeddings: Optional[int] = None

    @nn.compact
    def __call__(self, x, cond_id=None):
        residual = x
        x = nn.Conv(self.dim, (7,), padding="SAME",
                    feature_group_count=self.dim, name="dwconv")(x)
        if self.adanorm_num_embeddings:
            x = AdaLayerNorm(self.adanorm_num_embeddings, self.dim,
                             name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda k: jnp.full((self.dim,),
                                   self.layer_scale_init_value))
            x = gamma * x
        return residual + x


class VocosBackbone(nn.Module):
    input_channels: int = 80
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    layer_scale_init_value: Optional[float] = None
    adanorm_num_embeddings: Optional[int] = None

    @nn.compact
    def __call__(self, x, cond_id=None):
        """x: [B, T, input_channels] -> [B, T, dim]."""
        x = nn.Conv(self.dim, (7,), padding="SAME", name="embed")(x)
        if self.adanorm_num_embeddings:
            x = AdaLayerNorm(self.adanorm_num_embeddings, self.dim,
                             name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        scale = self.layer_scale_init_value or 1.0 / self.num_layers
        for i in range(self.num_layers):
            x = ConvNeXtBlock(self.dim, self.intermediate_dim, scale,
                              self.adanorm_num_embeddings,
                              name=f"convnext_{i}")(x, cond_id)
        return nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)


class VocosResBlock(nn.Module):
    """HiFi-GAN-style dilated resblock with layer scale (`modules.py:
    91-160-ish`), no upsampling."""
    dim: int
    kernel_size: int = 3
    dilations: tuple = (1, 3, 5)
    layer_scale_init_value: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        for d_idx, d in enumerate(self.dilations):
            y = nn.leaky_relu(x, 0.1)
            y = nn.Conv(self.dim, (self.kernel_size,), kernel_dilation=(d,),
                        padding="SAME", name=f"conv1_{d_idx}")(y)
            y = nn.leaky_relu(y, 0.1)
            y = nn.Conv(self.dim, (self.kernel_size,), padding="SAME",
                        name=f"conv2_{d_idx}")(y)
            if self.layer_scale_init_value:
                gamma = self.param(
                    f"gamma_{d_idx}",
                    lambda k, s=self.layer_scale_init_value:
                    jnp.full((self.dim,), s))
                y = gamma * y
            x = x + y
        return x


class VocosResNetBackbone(nn.Module):
    input_channels: int = 80
    dim: int = 512
    num_blocks: int = 3
    layer_scale_init_value: Optional[float] = None

    @nn.compact
    def __call__(self, x, cond_id=None):
        x = nn.Conv(self.dim, (3,), padding="SAME", name="embed")(x)
        scale = self.layer_scale_init_value or 1.0 / self.num_blocks / 3
        for i in range(self.num_blocks):
            x = VocosResBlock(self.dim, layer_scale_init_value=scale,
                              name=f"resnet_{i}")(x)
        return x


# --- MDCT / IMDCT -----------------------------------------------------------

def _cosine_window(n):
    return np.sin(np.pi * (np.arange(n) + 0.5) / n).astype(np.float32)


def mdct(audio, frame_len: int, padding: str = "same"):
    """[B, T] -> [B, L, N] MDCT coefficients (`spectral_ops.py:78-131`)."""
    N = frame_len // 2
    n0 = (N + 1) / 2
    pad = frame_len // 2 if padding == "center" else frame_len // 4
    audio = jnp.pad(audio, ((0, 0), (pad, pad)))
    T = audio.shape[-1]
    n_frames = (T - frame_len) // N + 1
    idx = np.arange(n_frames)[:, None] * N + np.arange(frame_len)[None, :]
    x = audio[:, idx] * _cosine_window(frame_len)
    pre = jnp.exp(-1j * jnp.pi * jnp.arange(frame_len) / frame_len)
    post = jnp.exp(-1j * jnp.pi * n0 * (jnp.arange(N) + 0.5) / N)
    X = jnp.fft.fft(x * pre, axis=-1)[..., :N]
    return jnp.real(X * post * np.sqrt(1 / N)) * np.sqrt(2)


def imdct(X, frame_len: int, padding: str = "same"):
    """[B, L, N] -> [B, T] (`spectral_ops.py:134-192`)."""
    B, L, N = X.shape
    n0 = (N + 1) / 2
    Y = jnp.concatenate([X, -jnp.conj(X[..., ::-1])], axis=-1)
    pre = jnp.exp(1j * jnp.pi * n0 * jnp.arange(2 * N) / N)
    post = jnp.exp(1j * jnp.pi * (jnp.arange(2 * N) + n0) / (2 * N))
    y = jnp.fft.ifft(Y * pre, axis=-1)
    y = jnp.real(y * post) * np.sqrt(N) * np.sqrt(2)
    y = y * _cosine_window(frame_len)
    # overlap-add with hop N
    total = (L + 1) * N
    out = jnp.zeros((B, total), y.dtype)
    segs = y.reshape(B, L, 2, N)
    out = out.at[:, : L * N].add(segs[:, :, 0, :].reshape(B, L * N))
    out = out.at[:, N: N + L * N].add(segs[:, :, 1, :].reshape(B, L * N))
    pad = frame_len // 2 if padding == "center" else frame_len // 4
    return out[:, pad: total - pad]


# --- heads ------------------------------------------------------------------

class ISTFTHead(nn.Module):
    dim: int = 512
    n_fft: int = 1024
    hop_length: int = 256
    padding: str = "same"

    def setup(self):
        self.out = nn.Dense(self.n_fft + 2, name="out")

    def spectrum(self, x):
        """Backbone features -> (mag, phase) [B, n_fft//2+1, T] each."""
        y = self.out(x)
        mag, p = jnp.split(jnp.swapaxes(y, 1, 2), 2, axis=1)
        return jnp.clip(jnp.exp(mag), max=1e2), p

    def __call__(self, x, denoise_bias=None, denoise: float = 0.0):
        mag, p = self.spectrum(x)
        if denoise_bias is not None:
            mag = jnp.clip(mag - denoise * denoise_bias, 0.0, 1e2)
        S = mag * (jnp.cos(p) + 1j * jnp.sin(p))
        return istft(S, self.n_fft, self.hop_length,
                     center=self.padding == "center")


class IMDCTSymExpHead(nn.Module):
    dim: int = 512
    mdct_frame_len: int = 512
    padding: str = "same"
    clip_audio: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.mdct_frame_len // 2, name="out")(x)
        y = jnp.clip(symexp(y), -1e2, 1e2)
        audio = imdct(y, self.mdct_frame_len, self.padding)
        if self.clip_audio:
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio


class IMDCTCosHead(nn.Module):
    dim: int = 512
    mdct_frame_len: int = 512
    padding: str = "same"
    clip_audio: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.mdct_frame_len, name="out")(x)
        m, p = jnp.split(y, 2, axis=2)
        audio = imdct(jnp.clip(jnp.exp(m), max=1e2) * jnp.cos(p),
                      self.mdct_frame_len, self.padding)
        if self.clip_audio:
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio


# --- wrappers ---------------------------------------------------------------

CONFIG_22K = {"sample_rate": 22050, "n_mels": 80, "dim": 512,
              "intermediate_dim": 1536, "num_layers": 8, "n_fft": 1024,
              "hop_length": 256, "padding": "same"}
CONFIG_24K = {"sample_rate": 24000, "n_mels": 100, "dim": 512,
              "intermediate_dim": 1536, "num_layers": 8, "n_fft": 1024,
              "hop_length": 256, "padding": "center"}


class MelVocosModule(nn.Module):
    """Backbone + ISTFT head with fused spectral denoising
    (`pretrained.py:34-97`). Input mel is feature-last [B, T, n_mels]."""
    n_mels: int = 80
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    padding: str = "same"

    def setup(self):
        self.backbone = VocosBackbone(
            self.n_mels, self.dim, self.intermediate_dim, self.num_layers,
            name="backbone")
        self.head = ISTFTHead(self.dim, self.n_fft, self.hop_length,
                              self.padding, name="head")

    def __call__(self, mel, denoise_bias=None, denoise: float = 0.0):
        feats = self.backbone(mel)
        return self.head(feats, denoise_bias, denoise)

    def bias_vector(self, n_frames: int = 88):
        """Magnitude spectrum of the first frame from a zero mel
        (`pretrained.py:59-71`): [n_fft//2+1, 1]."""
        zero = jnp.zeros((1, n_frames, self.n_mels))
        feats = self.backbone(zero)
        mag, _ = self.head.spectrum(feats)
        return mag[0, :, 0:1]


@dataclasses.dataclass
class MelVocos:
    """Inference wrapper (reference `MelVocos`): mel [B, n_mels, T] channel-
    first in, wave out, with denoising strength."""
    config_name: str = "22k"
    sd_path: Optional[str] = None
    seed: int = 0

    def __post_init__(self):
        cfg = {"22k": CONFIG_22K, "24k": CONFIG_24K}[self.config_name]
        self.sample_rate = cfg["sample_rate"]
        self.module = MelVocosModule(**{k: v for k, v in cfg.items()
                                        if k != "sample_rate"})
        if self.sd_path:
            from ..runtime.checkpoint import load_torch_state_dict
            from ..models.torch_import import vocos_params_from_torch
            sd = load_torch_state_dict(self.sd_path)
            sd.pop("__extras__", None)
            self.variables = vocos_params_from_torch(sd, cfg["num_layers"])
        else:
            # init under jit: the head's complex ISTFT ops only run
            # compiled on the TPU backend (eager raises UNIMPLEMENTED)
            self.variables = jax.jit(self.module.init)(
                jax.random.PRNGKey(self.seed),
                jnp.zeros((1, 16, cfg["n_mels"])))
        self.bias_vec = jax.jit(
            lambda v: self.module.apply(v,
                                        method=MelVocosModule.bias_vector)
        )(self.variables)
        self._fwd = jax.jit(self._fwd_fn)

    def _fwd_fn(self, variables, mel, bias, denoise):
        return self.module.apply(variables, mel, bias, denoise)

    def __call__(self, mel, denoise: float = 0.0):
        """mel: [B, n_mels, T] or [n_mels, T] -> wave [B, T*hop]."""
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        mel = jnp.swapaxes(mel, 1, 2)  # feature-last
        return np.asarray(self._fwd(self.variables, mel, self.bias_vec,
                                    jnp.float32(denoise)))


# --- generic Vocos (reference `Vocos.from_hparams/from_pretrained`) ----------

@dataclasses.dataclass(frozen=True)
class MelSpectrogramFeatures:
    """Vocos mel feature extractor (reference `MelSpectrogramFeatures`,
    feature_extractors.py:28-64): HTK-scale unnormalized mel (torchaudio
    defaults), power-1 magnitude, safe_log clip at 1e-7."""
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 100
    padding: str = "center"

    def _compute(self, audio):
        from ..audio.mel import frame_signal, slaney_mel_filterbank
        pad = (self.n_fft // 2 if self.padding == "center"
               else (self.n_fft - self.hop_length) // 2)
        x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
                    mode="reflect")
        window = jnp.asarray(
            np.hanning(self.n_fft + 1)[:-1].astype(np.float32))
        frames = frame_signal(x, self.n_fft, self.hop_length) * window
        mag = jnp.abs(jnp.fft.rfft(frames, n=self.n_fft, axis=-1))
        basis = jnp.asarray(slaney_mel_filterbank(
            self.sample_rate, self.n_fft, self.n_mels, norm=None, htk=True))
        mel = jnp.einsum("mf,...tf->...mt", basis, mag)
        return jnp.log(jnp.clip(mel, min=1e-7))

    def __call__(self, audio):
        """audio [..., T] -> log-mel [..., n_mels, frames]. Jitted (cached
        per extractor config): the TPU backend only supports the complex
        rfft intermediate under jit, and eager op-by-op dispatch is very
        slow on remote devices."""
        return _mel_features_jit(self)(jnp.asarray(audio))


@functools.lru_cache(maxsize=8)
def _mel_features_jit(extractor: "MelSpectrogramFeatures"):
    return jax.jit(extractor._compute)


class _VocosModel(nn.Module):
    backbone: nn.Module
    head: nn.Module

    def __call__(self, features):
        """features [B, T, C] feature-last -> wave [B, T*hop]."""
        return self.head(self.backbone(features))


_VOCOS_CLASSES = {
    "VocosBackbone": VocosBackbone,
    "VocosResNetBackbone": VocosResNetBackbone,
    "ISTFTHead": ISTFTHead,
    "IMDCTSymExpHead": IMDCTSymExpHead,
    "IMDCTCosHead": IMDCTCosHead,
    "MelSpectrogramFeatures": MelSpectrogramFeatures,
}


def _instantiate(spec):
    name = spec["class_path"].rsplit(".", 1)[-1]
    if name not in _VOCOS_CLASSES:
        raise ValueError(f"unsupported Vocos component {spec['class_path']}")
    return _VOCOS_CLASSES[name](**spec.get("init_args", {}))


@dataclasses.dataclass
class Vocos:
    """Generic Vocos inference wrapper built from a reference-format hparams
    yaml (reference `Vocos.from_hparams`/`from_pretrained`,
    pretrained.py:100-181): feature extractor + backbone + head, dispatched
    by class name."""
    feature_extractor: MelSpectrogramFeatures
    module: _VocosModel
    variables: dict

    @classmethod
    def from_hparams(cls, config_path, state_dict_path=None, seed: int = 0):
        import yaml
        with open(config_path) as f:
            config = yaml.safe_load(f)
        feature_extractor = _instantiate(config["feature_extractor"])
        backbone_spec = config["backbone"]
        backbone = _instantiate(backbone_spec)
        head = _instantiate(config["head"])
        module = _VocosModel(backbone, head)
        if state_dict_path is not None:
            from ..models.torch_import import vocos_params_from_torch
            from ..runtime.checkpoint import load_torch_state_dict
            if not isinstance(backbone, VocosBackbone):
                raise ValueError(
                    "state-dict import is supported for the ConvNeXt "
                    "VocosBackbone only")
            sd = load_torch_state_dict(state_dict_path)
            sd.pop("__extras__", None)
            inner = vocos_params_from_torch(
                sd, backbone_spec.get("init_args", {}).get("num_layers", 8))
            variables = {"params": inner["params"]}
        else:
            n_in = getattr(backbone, "input_channels", 100)
            # init under jit: complex ISTFT ops fail eagerly on TPU
            variables = jax.jit(module.init)(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, 16, n_in)))
        return cls(feature_extractor, module, variables)

    @classmethod
    def from_pretrained(cls, repo_id: str, revision=None):
        """Hugging Face hub loader (network-gated, like the reference's)."""
        try:
            from huggingface_hub import hf_hub_download
        except ImportError as e:
            raise RuntimeError(
                "from_pretrained needs huggingface_hub; download "
                "config.yaml + pytorch_model.bin manually and use "
                "from_hparams(config, state_dict_path)") from e
        config_path = hf_hub_download(repo_id, "config.yaml",
                                      revision=revision)
        model_path = hf_hub_download(repo_id, "pytorch_model.bin",
                                     revision=revision)
        return cls.from_hparams(config_path, model_path)

    def __post_init__(self):
        # jit: the ISTFT's complex intermediates are only supported inside
        # a compiled program on the TPU backend (and eager dispatch is slow)
        self._apply = jax.jit(self.module.apply)

    def decode(self, features):
        """features [B, C, T] channel-first (reference layout) -> wave."""
        x = jnp.swapaxes(jnp.asarray(features), -1, -2)
        return np.asarray(self._apply(self.variables, x))

    def __call__(self, audio):
        """Copy-synthesis: waveform -> mel features -> waveform
        (reference `Vocos.forward`, pretrained.py:148-164)."""
        feats = self.feature_extractor(jnp.asarray(audio))
        return self.decode(feats)
