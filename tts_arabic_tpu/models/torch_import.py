"""PyTorch -> flax parameter import for the reference checkpoints.

Maps reference state_dict keys (NVIDIA FastPitch layout,
`models/fastpitch/fastpitch/model.py`; HiFi-GAN layout,
`vocoder/hifigan/models.py`) onto our flax pytrees. Conventions:

- torch Linear weight [out, in]       -> Dense kernel [in, out] (transpose)
- torch Conv1d weight [out, in, k]    -> Conv kernel [k, in, out]
- torch ConvTranspose1d [in, out, k]  -> our transposed-conv kernel
  [k, in, out], flipped along k (op-ready for the lhs-dilated convolution in
  vocoder/hifigan.py::conv_transpose_1d)
- LayerNorm weight/bias               -> scale/bias
- Embedding weight                    -> embedding

Weight-norm parametrizations (HiFi-GAN) are folded:
w = g * v / ||v||  (the reference removes weight norm at load time,
`vocoder/__init__.py:19`).
"""
from __future__ import annotations

import numpy as np


def _dense(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _dense_nobias(sd, prefix):
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}


def _conv1d(sd, prefix):
    w = sd[f"{prefix}.weight"]  # [out, in, k]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _embed(sd, prefix):
    return {"embedding": sd[f"{prefix}.weight"]}


def _fft_layer(sd, p):
    return {
        "attn": {
            "qkv": _dense(sd, f"{p}.dec_attn.qkv_net"),
            "o": _dense_nobias(sd, f"{p}.dec_attn.o_net"),
            "ln": _ln(sd, f"{p}.dec_attn.layer_norm"),
        },
        "ff": {
            "conv1": _conv1d(sd, f"{p}.pos_ff.CoreNet.0"),
            "conv2": _conv1d(sd, f"{p}.pos_ff.CoreNet.2"),
            "ln": _ln(sd, f"{p}.pos_ff.layer_norm"),
        },
    }


def _fft_stack(sd, prefix, n_layers, embed=False):
    out = {f"layer_{i}": _fft_layer(sd, f"{prefix}.layers.{i}")
           for i in range(n_layers)}
    if embed:
        out["word_emb"] = _embed(sd, f"{prefix}.word_emb")
    return out


def _predictor(sd, prefix, n_layers=2):
    out = {f"layer_{i}": {
        "conv": _conv1d(sd, f"{prefix}.layers.{i}.conv"),
        "ln": _ln(sd, f"{prefix}.layers.{i}.norm"),
    } for i in range(n_layers)}
    out["fc"] = _dense(sd, f"{prefix}.fc")
    return out


def fastpitch_params_from_torch(sd: dict, config) -> dict:
    """Reference FastPitch state_dict -> our flax params tree.

    `sd` is a flat {key: ndarray} (use runtime.load_torch_state_dict).
    The unused `attention.attn_proj` conv (attention.py:96; never called in
    forward) is dropped.
    """
    params = {
        "encoder": _fft_stack(sd, "encoder", config.enc_n_layers, embed=True),
        "decoder": _fft_stack(sd, "decoder", config.dec_n_layers),
        "duration_predictor": _predictor(sd, "duration_predictor",
                                         config.dur_n_layers),
        "pitch_predictor": _predictor(sd, "pitch_predictor",
                                      config.pitch_n_layers),
        "pitch_emb": _conv1d(sd, "pitch_emb"),
        "proj": _dense(sd, "proj"),
        "attention": {
            "key_conv1": _conv1d(sd, "attention.key_proj.0.conv"),
            "key_conv2": _conv1d(sd, "attention.key_proj.2.conv"),
            "query_conv1": _conv1d(sd, "attention.query_proj.0.conv"),
            "query_conv2": _conv1d(sd, "attention.query_proj.2.conv"),
            "query_conv3": _conv1d(sd, "attention.query_proj.4.conv"),
        },
        "pitch_mean": sd.get("pitch_mean", np.zeros(1, np.float32)),
        "pitch_std": sd.get("pitch_std", np.zeros(1, np.float32)),
    }
    if config.energy_conditioning:
        params["energy_predictor"] = _predictor(sd, "energy_predictor",
                                                config.energy_n_layers)
        params["energy_emb"] = _conv1d(sd, "energy_emb")
    if config.n_speakers > 1 and "speaker_emb.weight" in sd:
        params["speaker_emb"] = _embed(sd, "speaker_emb")
    return {"params": params}


# --- HiFi-GAN ---------------------------------------------------------------

def _fold_weight_norm(sd: dict) -> dict:
    """Fold weight-norm parametrizations into plain weights.

    Handles both layouts: modern `parametrizations.weight.original0/1`
    (g, v) and legacy `weight_g`/`weight_v`.
    """
    out = {}
    done = set()
    for key in sd:
        if key in done:
            continue
        if key.endswith("parametrizations.weight.original0"):
            base = key[: -len("parametrizations.weight.original0")]
            g = sd[key]
            v = sd[base + "parametrizations.weight.original1"]
            done.add(base + "parametrizations.weight.original1")
            norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(1))
            out[base + "weight"] = g.reshape(-1, *[1] * (v.ndim - 1)) * v / \
                norm.reshape(-1, *[1] * (v.ndim - 1))
        elif key.endswith("weight_g"):
            base = key[: -len("weight_g")]
            g, v = sd[key], sd[base + "weight_v"]
            done.add(base + "weight_v")
            norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(1))
            out[base + "weight"] = g.reshape(-1, *[1] * (v.ndim - 1)) * v / \
                norm.reshape(-1, *[1] * (v.ndim - 1))
        elif key.endswith("weight_v") or key.endswith(
                "parametrizations.weight.original1"):
            continue
        else:
            out[key] = sd[key]
    return out


def hifigan_params_from_torch(sd: dict, config) -> dict:
    """Reference HiFi-GAN Generator state_dict -> our flax params.

    config: HiFiGANConfig (upsample rates/kernels, resblock kernels,
    dilations).
    """
    sd = _fold_weight_norm(dict(sd))
    params = {"conv_pre": _conv1d(sd, "conv_pre"),
              "conv_post": _conv1d(sd, "conv_post")}
    n_kernels = len(config.resblock_kernel_sizes)
    for i in range(len(config.upsample_rates)):
        w = sd[f"ups.{i}.weight"]  # torch ConvT layout [in, out, k]
        # op-ready layout for conv_transpose_1d: [k, in, out], flipped along k
        params[f"up_{i}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 0, 1)[::-1]),
            "bias": sd[f"ups.{i}.bias"],
        }
        for j in range(n_kernels):
            ridx = i * n_kernels + j
            block = {}
            n_d = len(config.resblock_dilation_sizes[j])
            for d in range(n_d):
                block[f"conv1_{d}"] = _conv1d(sd, f"resblocks.{ridx}.convs1.{d}")
                block[f"conv2_{d}"] = _conv1d(sd, f"resblocks.{ridx}.convs2.{d}")
            params[f"res_{i}_{j}"] = block
    return {"params": params}


# --- Tacotron2 --------------------------------------------------------------

def _lstm_cell(sd, prefix):
    return {
        "wi": np.ascontiguousarray(sd[f"{prefix}.weight_ih"].T),
        "wh": np.ascontiguousarray(sd[f"{prefix}.weight_hh"].T),
        "bi": sd[f"{prefix}.bias_ih"],
        "bh": sd[f"{prefix}.bias_hh"],
    }


def _lstm_layer(sd, prefix, suffix=""):
    return {
        "wi": np.ascontiguousarray(sd[f"{prefix}.weight_ih_l0{suffix}"].T),
        "wh": np.ascontiguousarray(sd[f"{prefix}.weight_hh_l0{suffix}"].T),
        "bi": sd[f"{prefix}.bias_ih_l0{suffix}"],
        "bh": sd[f"{prefix}.bias_hh_l0{suffix}"],
    }


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def tacotron2_params_from_torch(sd: dict, config) -> dict:
    """Reference Tacotron2MS state_dict (torchaudio `_Encoder`/`_Decoder`/
    `_Postnet` layout, `models/tacotron2/tacotron2_ms.py:113`) -> our flax
    variables {'params', 'batch_stats'}."""
    params = {"embedding": _embed(sd, "embedding")}
    stats = {}
    for i in range(config.encoder_n_convolutions):
        params[f"enc_conv_{i}"] = _conv1d(
            sd, f"encoder.convolutions.{i}.0.conv")
        params[f"enc_bn_{i}"], stats[f"enc_bn_{i}"] = _bn(
            sd, f"encoder.convolutions.{i}.1")
    params["enc_lstm"] = {
        "fwd": _lstm_layer(sd, "encoder.lstm"),
        "bwd": _lstm_layer(sd, "encoder.lstm", "_reverse"),
    }
    if config.num_speakers > 1 and "speaker_embedding.weight" in sd:
        params["speaker_embedding"] = _embed(sd, "speaker_embedding")

    params["prenet1"] = _dense_nobias(sd, "decoder.prenet.layers.0.linear_layer")
    params["prenet2"] = _dense_nobias(sd, "decoder.prenet.layers.1.linear_layer")
    params["attention_rnn"] = _lstm_cell(sd, "decoder.attention_rnn")
    params["decoder_rnn"] = _lstm_cell(sd, "decoder.decoder_rnn")
    params["query_layer"] = _dense_nobias(
        sd, "decoder.attention_layer.query_layer.linear_layer")
    params["memory_layer"] = _dense_nobias(
        sd, "decoder.attention_layer.memory_layer.linear_layer")
    params["v"] = _dense_nobias(sd, "decoder.attention_layer.v.linear_layer")
    params["location_conv"] = _conv1d(
        sd, "decoder.attention_layer.location_layer.location_conv.conv")
    params["location_dense"] = _dense_nobias(
        sd, "decoder.attention_layer.location_layer.location_dense.linear_layer")
    params["linear_projection"] = _dense(
        sd, "decoder.linear_projection.linear_layer")
    params["gate_layer"] = _dense(sd, "decoder.gate_layer.linear_layer")

    for i in range(config.postnet_n_convolutions):
        params[f"post_conv_{i}"] = _conv1d(
            sd, f"postnet.convolutions.{i}.0.conv")
        params[f"post_bn_{i}"], stats[f"post_bn_{i}"] = _bn(
            sd, f"postnet.convolutions.{i}.1")
    return {"params": params, "batch_stats": stats}


# --- Vocos ------------------------------------------------------------------

def vocos_params_from_torch(sd: dict, num_layers: int = 8) -> dict:
    """Reference MelVocos/Vocos state_dict (`vocoder/vocos/pretrained.py`)
    -> our flax variables. Feature-extractor buffers (torchaudio mel
    filterbanks) carry no learned weights and are skipped."""
    backbone = {
        "embed": _conv1d(sd, "backbone.embed"),
        "norm": _ln(sd, "backbone.norm"),
        "final_layer_norm": _ln(sd, "backbone.final_layer_norm"),
    }
    for i in range(num_layers):
        p = f"backbone.convnext.{i}"
        backbone[f"convnext_{i}"] = {
            "dwconv": _conv1d(sd, f"{p}.dwconv"),
            "norm": _ln(sd, f"{p}.norm"),
            "pwconv1": _dense(sd, f"{p}.pwconv1"),
            "pwconv2": _dense(sd, f"{p}.pwconv2"),
            "gamma": sd[f"{p}.gamma"],
        }
    head = {"out": _dense(sd, "head.out")}
    return {"params": {"backbone": backbone, "head": head}}
