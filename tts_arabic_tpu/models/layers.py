"""Shared neural layers for the acoustic models (flax.linen).

Functional re-implementations of the reference FFT-transformer stack
(`models/fastpitch/fastpitch/transformer.py`): sinusoidal positional
embeddings, fused-QKV multi-head self-attention with post-LayerNorm, and the
conv-k3 position-wise FFN. Layout is feature-last [B, T, C] throughout (the
native layout for flax convs and TPU tiling); the torch checkpoints'
channel-first conv weights are transposed by the importer
(`tts_arabic_tpu/models/torch_import.py`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_NEG_INF = -1e9  # large-negative fill; avoids NaN from (-inf * 0) under masks


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool mask (True inside the sequence)."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def sinusoidal_positions(n_pos: int, dim: int) -> np.ndarray:
    """[n_pos, dim] sinusoidal table, concat(sin, cos) layout (matches
    reference `PositionalEmbedding`, transformer.py:34-48)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0.0, dim, 2.0) / dim))
    angles = np.arange(n_pos)[:, None] * inv_freq[None, :]
    return np.concatenate([np.sin(angles), np.cos(angles)],
                          axis=1).astype(np.float32)


class SelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention, post-LN residual block
    (reference `MultiHeadAttn`, transformer.py:93-160)."""
    n_head: int
    d_model: int
    d_head: int
    dropout: float = 0.1
    dropatt: float = 0.1

    @nn.compact
    def __call__(self, x, key_mask, *, deterministic: bool = True):
        B, T, _ = x.shape
        h, d = self.n_head, self.d_head

        qkv = nn.Dense(3 * h * d, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, h, d), 3, axis=2)
        q = q.squeeze(2)  # [B, T, h, d]
        k = k.squeeze(2)
        v = v.squeeze(2)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(d, x.dtype))
        scores = jnp.where(key_mask[:, None, None, :], scores, _NEG_INF)
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropatt)(probs, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, h * d)
        out = nn.Dense(self.d_model, use_bias=False, name="o")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x + out)


class _Conv1d(nn.Module):
    """SAME k-conv with nn.Conv's exact param layout and init ("kernel"
    [k, Cin, Cout] lecun-normal, "bias" zeros — bit-identical init under
    the same scope name/RNG), but with the kernel directly accessible so
    the conv can optionally run on the MXU's double-rate int8 path with a
    static activation scale (`ops/int8.py`)."""
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, quant_scale=None):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if quant_scale is not None:
            from ..ops.int8 import int8_conv_static
            return int8_conv_static(x, kernel, bias, 1, quant_scale)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + bias.astype(x.dtype)


class ConvFFN(nn.Module):
    """Position-wise conv-k FFN, post-LN residual block (reference
    `PositionwiseConvFF`, transformer.py:51-90).

    When `mask` is given, every conv input is re-masked so padded positions
    read as zeros — exactly what the reference's convs see past the sequence
    end when run at exact length (zero "SAME" padding). This makes the stack
    *pad-invariant*: output at real positions is identical for any bucket
    padding, matching the reference's single-utterance (`ttmel_single`)
    semantics. The reference's own batched path leaks pad values through the
    second conv (transformer.py:51-90 has no inter-conv mask), making its
    results depend on batch composition; we deliberately do better.

    int8 serving hooks (both inert unless the caller opts in; neither is
    available under scan_layers):
    - a read-only "quant" collection entry `ffn_ascale` [2] at this
      module's path switches the two convs to the static-scale int8 path;
    - applying with `mutable=["calib"]` sows `ffn_amax{1,2}` (max-abs of
      each conv's input, max-reduced) for scale calibration."""
    d_model: int
    d_inner: int
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        m = (None if mask is None
             else mask[..., None].astype(x.dtype))
        xm = x if m is None else x * m
        q = (self.get_variable("quant", "ffn_ascale")
             if self.has_variable("quant", "ffn_ascale") else None)
        # init makes every collection mutable — don't sow junk into init'd
        # variables (it would leak into checkpoints)
        calib = (self.is_mutable_collection("calib")
                 and not self.is_initializing())
        _max = lambda a, b: jnp.maximum(a, b)  # noqa: E731
        _zero = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
        if calib:
            self.sow("calib", "ffn_amax1",
                     jnp.max(jnp.abs(xm.astype(jnp.float32))),
                     reduce_fn=_max, init_fn=_zero)
        y = _Conv1d(self.d_inner, self.kernel_size, name="conv1")(
            xm, quant_scale=None if q is None else q[0])
        y = nn.relu(y)
        if m is not None:
            y = y * m
        if calib:
            self.sow("calib", "ffn_amax2",
                     jnp.max(jnp.abs(y.astype(jnp.float32))),
                     reduce_fn=_max, init_fn=_zero)
        y = _Conv1d(self.d_model, self.kernel_size, name="conv2")(
            y, quant_scale=None if q is None else q[1])
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x + y)


class FFTBlock(nn.Module):
    """One transformer layer: masked self-attention + conv FFN, with the
    reference's mask-multiplies after each sublayer (transformer.py:172-177).
    """
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int
    dropout: float
    dropatt: float

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        m = mask[..., None].astype(x.dtype)
        x = SelfAttention(self.n_head, self.d_model, self.d_head,
                          self.dropout, self.dropatt, name="attn")(
            x, mask, deterministic=deterministic)
        x = x * m
        x = ConvFFN(self.d_model, self.d_inner, self.kernel_size,
                    self.dropout, name="ff")(x, mask,
                                             deterministic=deterministic)
        return x * m


class _FFTScanBody(nn.Module):
    """nn.scan adapter around FFTBlock: (carry, broadcast mask) ->
    (carry, None). Stacked under one param subtree with a leading layer
    axis (see FFTransformer.scan_layers)."""
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int
    dropout: float
    dropatt: float

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        y = FFTBlock(self.n_head, self.d_model, self.d_head, self.d_inner,
                     self.kernel_size, self.dropout, self.dropatt,
                     name="block")(x, mask, deterministic=deterministic)
        return y, None


class FFTransformer(nn.Module):
    """Stack of FFT blocks with sinusoidal positions; optionally owns the
    token embedding (reference `FFTransformer`, transformer.py:180-225).

    `scan_layers=True` compiles the n_layer identical blocks as ONE
    `lax.scan` over a stacked parameter axis instead of n_layer unrolled
    copies: the XLA program shrinks ~n_layer-fold for this stack, cutting
    compile time and per-op dispatch overhead at small batch (VERDICT r4
    #5 — an op-count lever, measured in tools/bench_train.py --scan-layers).
    Param layout changes (`layers/block/...` with a leading [n_layer] axis);
    `stack_fft_params` / `unstack_fft_params` convert to/from the per-layer
    `layer_{i}/...` layout used by checkpoints and the torch importer."""
    n_layer: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int
    dropout: float
    dropatt: float
    dropemb: float = 0.0
    embed_input: bool = False
    n_embed: Optional[int] = None
    padding_idx: int = 0
    scan_layers: bool = False

    def setup(self):
        if self.embed_input:
            self.word_emb = nn.Embed(self.n_embed, self.d_model,
                                     name="word_emb")
        if self.scan_layers:
            body = nn.scan(
                _FFTScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.n_layer)
            self.layers = body(self.n_head, self.d_model, self.d_head,
                               self.d_inner, self.kernel_size, self.dropout,
                               self.dropatt, name="layers")
        else:
            self.blocks = [
                FFTBlock(self.n_head, self.d_model, self.d_head,
                         self.d_inner, self.kernel_size, self.dropout,
                         self.dropatt, name=f"layer_{i}")
                for i in range(self.n_layer)
            ]
        self.emb_drop = nn.Dropout(self.dropemb)

    def __call__(self, inputs, seq_lens=None, conditioning=0.0, *,
                 deterministic: bool = True):
        """inputs: int tokens [B, T] (embed_input) or features [B, T, C].
        Returns (out [B, T, C], mask [B, T] bool)."""
        if self.embed_input:
            x = self.word_emb(inputs)
            mask = inputs != self.padding_idx
        else:
            x = inputs
            mask = sequence_mask(seq_lens, x.shape[1])

        pos = jnp.asarray(sinusoidal_positions(x.shape[1], self.d_model),
                          x.dtype)
        x = x + pos[None] * mask[..., None].astype(x.dtype) + conditioning
        x = self.emb_drop(x, deterministic=deterministic)
        if self.scan_layers:
            x, _ = self.layers(x, mask, deterministic)
        else:
            for block in self.blocks:
                x = block(x, mask, deterministic=deterministic)
        return x, mask

    def embed_tokens(self, inputs):
        return self.word_emb(inputs)


def stack_fft_params(tree):
    """Per-layer FFTransformer param subtree ({layer_0: .., layer_i: ..})
    -> scan layout ({layers: {block: <leading [n_layer] axis>}}). The
    inverse of `unstack_fft_params`; both preserve non-layer keys
    (word_emb). Used to load per-layer checkpoints (torch importer layout)
    into a scan_layers=True model."""
    import jax
    n = 0
    while f"layer_{n}" in tree:
        n += 1
    layers = [tree[f"layer_{i}"] for i in range(n)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = {k: v for k, v in tree.items() if not k.startswith("layer_")}
    out["layers"] = {"block": stacked}
    return out


def unstack_fft_params(tree):
    """Scan-layout FFTransformer param subtree -> per-layer layout (the
    checkpoint/torch-export layout). Inverse of `stack_fft_params`."""
    import jax
    stacked = tree["layers"]["block"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = {k: v for k, v in tree.items() if k != "layers"}
    for i in range(n):
        out[f"layer_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return out


class ConvReLUNorm(nn.Module):
    """Conv -> ReLU -> LayerNorm -> Dropout (reference `ConvReLUNorm`,
    model.py:45-57). `mask` re-masks the conv input for pad-invariance
    (see ConvFFN docstring)."""
    channels: int
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    name="conv")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(nn.relu(x))
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class TemporalPredictor(nn.Module):
    """Per-position scalar predictor head (reference `TemporalPredictor`,
    model.py:114-133)."""
    filter_size: int
    kernel_size: int = 3
    dropout: float = 0.1
    n_layers: int = 2
    n_predictions: int = 1

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        m = mask[..., None].astype(x.dtype)
        y = x * m
        for i in range(self.n_layers):
            y = ConvReLUNorm(self.filter_size, self.kernel_size, self.dropout,
                             name=f"layer_{i}")(y, mask,
                                                deterministic=deterministic)
        y = nn.Dense(self.n_predictions, name="fc")(y)
        return y * m
