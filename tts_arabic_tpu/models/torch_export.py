"""Flax -> PyTorch state-dict export: the inverse of `torch_import`.

Checkpoint interchange is bidirectional: models trained or fine-tuned
HERE load straight into the reference implementation — FastPitch/
Tacotron2 wrappers (`models/fastpitch/networks.py:52-60` honors the
embedded `config` + `symbols`) and `load_hifigan`
(`vocoder/__init__.py:3-20`, which removes weight norm at load, so the
generator is exported in the legacy `weight_g`/`weight_v` layout the
published artifact uses). Layout conventions are `torch_import`'s,
inverted:

- Dense kernel [in, out]    -> torch Linear weight [out, in]
- Conv kernel [k, in, out]  -> torch Conv1d weight [out, in, k]
- our transposed-conv kernel [k, in, out] (flipped) -> ConvTranspose1d
  [in, out, k]
- BatchNorm batch_stats     -> running_mean/running_var (+ the
  `num_batches_tracked` counter torch state dicts carry)

Unused-but-present reference modules are synthesized so
`load_state_dict(strict=True)` passes: FastPitch's `attention.attn_proj`
Conv2d (attention.py:96 — never called with the '3xconv' query encoder).
"""
from __future__ import annotations

import numpy as np


def _np(tree):
    return np.asarray(tree)


def _dense_t(sd, prefix, p, bias=True):
    sd[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    if bias and "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _conv1d_t(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.ascontiguousarray(
        _np(p["kernel"]).transpose(2, 1, 0))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _ln_t(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _embed_t(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["embedding"])


def _fft_stack_t(sd, prefix, stack):
    for name, layer in stack.items():
        if name == "word_emb":
            _embed_t(sd, f"{prefix}.word_emb", layer)
            continue
        i = name.split("_")[1]
        p = f"{prefix}.layers.{i}"
        _dense_t(sd, f"{p}.dec_attn.qkv_net", layer["attn"]["qkv"])
        _dense_t(sd, f"{p}.dec_attn.o_net", layer["attn"]["o"], bias=False)
        _ln_t(sd, f"{p}.dec_attn.layer_norm", layer["attn"]["ln"])
        _conv1d_t(sd, f"{p}.pos_ff.CoreNet.0", layer["ff"]["conv1"])
        _conv1d_t(sd, f"{p}.pos_ff.CoreNet.2", layer["ff"]["conv2"])
        _ln_t(sd, f"{p}.pos_ff.layer_norm", layer["ff"]["ln"])


def _predictor_t(sd, prefix, pred):
    for name, layer in pred.items():
        if name == "fc":
            _dense_t(sd, f"{prefix}.fc", layer)
            continue
        i = name.split("_")[1]
        _conv1d_t(sd, f"{prefix}.layers.{i}.conv", layer["conv"])
        _ln_t(sd, f"{prefix}.layers.{i}.norm", layer["ln"])


def fastpitch_params_to_torch(variables: dict, config) -> dict:
    """Our flax variables -> reference FastPitch state_dict (flat
    {key: ndarray}; `torch.save`-ready via `save_reference_checkpoint`)."""
    params = variables["params"] if "params" in variables else variables
    sd: dict = {}
    _fft_stack_t(sd, "encoder", params["encoder"])
    _fft_stack_t(sd, "decoder", params["decoder"])
    # sinusoidal PositionalEmbedding buffer (transformer.py:38-39);
    # deterministic in d_model — synthesize so strict load passes
    for stack, d in (("encoder", config.d_model), ("decoder", config.d_model)):
        sd[f"{stack}.pos_emb.inv_freq"] = (
            1.0 / (10000.0 ** (np.arange(0.0, d, 2.0) / d))
        ).astype(np.float32)
    _predictor_t(sd, "duration_predictor", params["duration_predictor"])
    _predictor_t(sd, "pitch_predictor", params["pitch_predictor"])
    _conv1d_t(sd, "pitch_emb", params["pitch_emb"])
    _dense_t(sd, "proj", params["proj"])
    att = params["attention"]
    _conv1d_t(sd, "attention.key_proj.0.conv", att["key_conv1"])
    _conv1d_t(sd, "attention.key_proj.2.conv", att["key_conv2"])
    _conv1d_t(sd, "attention.query_proj.0.conv", att["query_conv1"])
    _conv1d_t(sd, "attention.query_proj.2.conv", att["query_conv2"])
    _conv1d_t(sd, "attention.query_proj.4.conv", att["query_conv3"])
    # unused Conv2d the reference instantiates anyway (attention.py:96):
    # synthesize zeros so strict load passes
    sd["attention.attn_proj.weight"] = np.zeros(
        (1, config.attn_channels, 1, 1), np.float32)
    sd["attention.attn_proj.bias"] = np.zeros((1,), np.float32)
    sd["pitch_mean"] = _np(params.get(
        "pitch_mean", np.zeros(1, np.float32))).reshape(1)
    sd["pitch_std"] = _np(params.get(
        "pitch_std", np.zeros(1, np.float32))).reshape(1)
    if config.energy_conditioning:
        _predictor_t(sd, "energy_predictor", params["energy_predictor"])
        _conv1d_t(sd, "energy_emb", params["energy_emb"])
    if "speaker_emb" in params:
        _embed_t(sd, "speaker_emb", params["speaker_emb"])
    return sd


# --- HiFi-GAN ---------------------------------------------------------------

def _weight_norm_split(sd, prefix, weight, layout):
    """w -> weight-norm pair with v = w, g = ||w|| over all-but-dim-0 —
    folds back to w exactly (torch_import's `_fold_weight_norm` and
    torch's `remove_weight_norm` agree). `layout`: "legacy" emits
    `weight_g`/`weight_v` (the published hifigan-asc.pth layout);
    "parametrizations" emits `parametrizations.weight.original0/1` (what
    the reference code's modern `torch.nn.utils.parametrizations`
    modules serialize, `vocoder/hifigan/models.py:6`)."""
    w = np.ascontiguousarray(weight)
    g = np.sqrt((w.reshape(w.shape[0], -1) ** 2).sum(1))
    g = g.reshape(-1, *[1] * (w.ndim - 1))
    if layout == "legacy":
        sd[f"{prefix}.weight_g"] = g
        sd[f"{prefix}.weight_v"] = w
    else:
        sd[f"{prefix}.parametrizations.weight.original0"] = g
        sd[f"{prefix}.parametrizations.weight.original1"] = w


def hifigan_params_to_torch(variables: dict, config,
                            layout: str = "legacy") -> dict:
    """Our flax Generator params -> reference weight-normed state_dict."""
    if layout not in ("legacy", "parametrizations"):
        raise ValueError(f"unknown weight-norm layout {layout!r}")
    params = variables["params"] if "params" in variables else variables

    def conv(prefix, p):
        _weight_norm_split(sd, prefix, _np(p["kernel"]).transpose(2, 1, 0),
                           layout)
        sd[f"{prefix}.bias"] = _np(p["bias"])

    sd: dict = {}
    conv("conv_pre", params["conv_pre"])
    conv("conv_post", params["conv_post"])
    n_kernels = len(config.resblock_kernel_sizes)
    for i in range(len(config.upsample_rates)):
        k = _np(params[f"up_{i}"]["kernel"])  # [k, in, out], k-flipped
        _weight_norm_split(sd, f"ups.{i}",
                           k[::-1].transpose(1, 2, 0), layout)  # [in,out,k]
        sd[f"ups.{i}.bias"] = _np(params[f"up_{i}"]["bias"])
        for j in range(n_kernels):
            ridx = i * n_kernels + j
            block = params[f"res_{i}_{j}"]
            for d in range(len(config.resblock_dilation_sizes[j])):
                conv(f"resblocks.{ridx}.convs1.{d}", block[f"conv1_{d}"])
                conv(f"resblocks.{ridx}.convs2.{d}", block[f"conv2_{d}"])
    return sd


# --- Tacotron2 --------------------------------------------------------------

def _lstm_cell_t(sd, prefix, p, suffix=""):
    sd[f"{prefix}.weight_ih{suffix}"] = np.ascontiguousarray(_np(p["wi"]).T)
    sd[f"{prefix}.weight_hh{suffix}"] = np.ascontiguousarray(_np(p["wh"]).T)
    sd[f"{prefix}.bias_ih{suffix}"] = _np(p["bi"])
    sd[f"{prefix}.bias_hh{suffix}"] = _np(p["bh"])


def _bn_t(sd, prefix, p, stats):
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])
    sd[f"{prefix}.running_mean"] = _np(stats["mean"])
    sd[f"{prefix}.running_var"] = _np(stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def tacotron2_params_to_torch(variables: dict, config) -> dict:
    """Our flax variables {'params','batch_stats'} -> reference
    Tacotron2MS state_dict (torchaudio `_Encoder`/`_Decoder`/`_Postnet`
    layout, `models/tacotron2/tacotron2_ms.py:113`)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    _embed_t(sd, "embedding", params["embedding"])
    for i in range(config.encoder_n_convolutions):
        _conv1d_t(sd, f"encoder.convolutions.{i}.0.conv",
                  params[f"enc_conv_{i}"])
        _bn_t(sd, f"encoder.convolutions.{i}.1", params[f"enc_bn_{i}"],
              stats[f"enc_bn_{i}"])
    _lstm_cell_t(sd, "encoder.lstm", params["enc_lstm"]["fwd"], "_l0")
    _lstm_cell_t(sd, "encoder.lstm", params["enc_lstm"]["bwd"],
                 "_l0_reverse")
    if "speaker_embedding" in params:
        _embed_t(sd, "speaker_embedding", params["speaker_embedding"])

    _dense_t(sd, "decoder.prenet.layers.0.linear_layer", params["prenet1"],
             bias=False)
    _dense_t(sd, "decoder.prenet.layers.1.linear_layer", params["prenet2"],
             bias=False)
    _lstm_cell_t(sd, "decoder.attention_rnn", params["attention_rnn"])
    _lstm_cell_t(sd, "decoder.decoder_rnn", params["decoder_rnn"])
    _dense_t(sd, "decoder.attention_layer.query_layer.linear_layer",
             params["query_layer"], bias=False)
    _dense_t(sd, "decoder.attention_layer.memory_layer.linear_layer",
             params["memory_layer"], bias=False)
    _dense_t(sd, "decoder.attention_layer.v.linear_layer", params["v"],
             bias=False)
    _conv1d_t(sd, "decoder.attention_layer.location_layer.location_conv.conv",
              params["location_conv"])
    _dense_t(sd, "decoder.attention_layer.location_layer.location_dense"
             ".linear_layer", params["location_dense"], bias=False)
    _dense_t(sd, "decoder.linear_projection.linear_layer",
             params["linear_projection"])
    _dense_t(sd, "decoder.gate_layer.linear_layer", params["gate_layer"])

    for i in range(config.postnet_n_convolutions):
        _conv1d_t(sd, f"postnet.convolutions.{i}.0.conv",
                  params[f"post_conv_{i}"])
        _bn_t(sd, f"postnet.convolutions.{i}.1", params[f"post_bn_{i}"],
              stats[f"post_bn_{i}"])
    return sd


def save_reference_checkpoint(path, sd: dict, *, key: str = "model",
                              config: dict | None = None,
                              symbols=None, extras: dict | None = None):
    """torch.save a reference-layout .pth: {key: tensors(, config,
    symbols, ...)} — the format the reference wrappers construct models
    from (`models/fastpitch/networks.py:52-60`)."""
    import torch

    payload = {key: {k: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in sd.items()}}
    if config is not None:
        payload["config"] = dict(config)
    if symbols is not None:
        payload["symbols"] = list(symbols)
    if extras:
        payload.update(extras)
    torch.save(payload, path)
    return path
