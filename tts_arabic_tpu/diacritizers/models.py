"""JAX diacritizer networks + host-side encode/decode.

Shakkala (`models/diacritizers/shakkala/network.py:8-77`):
  Embedding(149->288) -> BiLSTM-hardsigmoid(288) -> BatchNorm ->
  BiLSTM-hs(144) -> BiLSTM-hs(96) -> Linear(192->28) -> softmax;
  the hard-sigmoid gates reproduce Keras semantics that cuDNN can't
  (`lstm_hsm.py:352-379`) — here they're just a different gate activation
  in the same `lax.scan` cell.

Shakkelha (`models/diacritizers/shakkelha/network.py:9-80`):
  Embedding(91->25) -> BiLSTM(256) x2 -> Dense(512) x2 ReLU -> Dense(19)
  softmax; decode skips non-Arabic characters and '<'-prefixed classes.

Both run each utterance as one jitted forward (scan over characters);
predictions are argmax per character, recombined with the input text on the
host.
"""
from __future__ import annotations

import json
import pathlib
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

_HERE = pathlib.Path(__file__).parent


def _load_vocab(name):
    with open(_HERE / name, encoding="utf-8") as f:
        return json.load(f)


def hard_sigmoid(x):
    """Keras hard sigmoid: clip(0.2x + 0.5, 0, 1)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def _lstm_scan(p, x, gate_fn):
    """Unidirectional LSTM over [T, C] -> [T, H]; gate order [i, f, g, o]."""
    H = p["wh"].shape[0]

    def step(carry, xt):
        h, c = carry
        z = xt @ p["wi"] + p["bi"] + h @ p["wh"] + p["bh"]
        i, f, g, o = jnp.split(z, 4)
        c = gate_fn(f) * c + gate_fn(i) * jnp.tanh(g)
        h = gate_fn(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros(H, x.dtype), jnp.zeros(H, x.dtype))
    _, ys = jax.lax.scan(step, init, x)
    return ys


def _bilstm(params, x, gate_fn=jax.nn.sigmoid):
    fwd = _lstm_scan(params["fwd"], x, gate_fn)
    bwd = _lstm_scan(params["bwd"], x[::-1], gate_fn)[::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)


def _lstm_scan_batch(p, x, mask, gate_fn):
    """Batched LSTM over [B, T, C] -> [B, T, H] with a [B, T] validity
    mask: the carry HOLDS at masked steps, so for right-padded input the
    forward pass, and for its reversal the backward pass, produce exactly
    the per-utterance unpadded results at every valid position."""
    H = p["wh"].shape[0]

    def step(carry, inp):
        xt, mt = inp
        h, c = carry
        z = xt @ p["wi"] + p["bi"] + h @ p["wh"] + p["bh"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_new = gate_fn(f) * c + gate_fn(i) * jnp.tanh(g)
        h_new = gate_fn(o) * jnp.tanh(c_new)
        m = mt[:, None]
        return (jnp.where(m, h_new, h), jnp.where(m, c_new, c)), h_new

    B = x.shape[0]
    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, ys = jax.lax.scan(step, init, (x.swapaxes(0, 1), mask.T))
    return ys.swapaxes(0, 1)


def _bilstm_batch(params, x, mask, gate_fn=jax.nn.sigmoid):
    fwd = _lstm_scan_batch(params["fwd"], x, mask, gate_fn)
    bwd = _lstm_scan_batch(params["bwd"], x[:, ::-1], mask[:, ::-1],
                           gate_fn)[:, ::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)


_LEN_BUCKET = 32  # char-length bucket: one compile per 32-char step


def _pad_batch(ids_list):
    """List of int32 [L_i] -> padded [B, L_bucket] ids + [B, L_bucket]
    mask (right padding)."""
    L = max(len(i) for i in ids_list)
    L = -(-L // _LEN_BUCKET) * _LEN_BUCKET
    B = len(ids_list)
    ids = np.zeros((B, L), np.int32)
    mask = np.zeros((B, L), bool)
    for b, row in enumerate(ids_list):
        ids[b, : len(row)] = row
        mask[b, : len(row)] = True
    return jnp.asarray(ids), jnp.asarray(mask)


def _import_bilstm(sd, prefix):
    def layer(suffix):
        return {"wi": np.ascontiguousarray(sd[f"{prefix}.weight_ih_l0{suffix}"].T),
                "wh": np.ascontiguousarray(sd[f"{prefix}.weight_hh_l0{suffix}"].T),
                "bi": sd[f"{prefix}.bias_ih_l0{suffix}"],
                "bh": sd[f"{prefix}.bias_hh_l0{suffix}"]}
    return {"fwd": layer(""), "bwd": layer("_reverse")}


def _import_dense(sd, prefix):
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "b": sd[f"{prefix}.bias"]}


class Shakkala:
    """Hard-sigmoid BiLSTM diacritizer."""

    def __init__(self, sd_path: Optional[str] = None, params=None, seed=0):
        vocab = _load_vocab("vocab_shakkala.json")
        self.char_to_id = vocab["input_vocab_to_int"]
        self.id_to_class = {int(k): v for k, v in
                            vocab["output_int_to_vocab"].items()}
        if sd_path is not None:
            from ..runtime.checkpoint import load_torch_state_dict
            sd = load_torch_state_dict(sd_path)
            sd.pop("__extras__", None)
            params = {
                "emb": sd["emb_input.weight"],
                "lstm0": _import_bilstm(sd, "lstm0"),
                "bn0": {"scale": sd["bn0.weight"], "bias": sd["bn0.bias"],
                        "mean": sd["bn0.running_mean"],
                        "var": sd["bn0.running_var"]},
                "lstm1": _import_bilstm(sd, "lstm1"),
                "lstm2": _import_bilstm(sd, "lstm2"),
                "dense0": _import_dense(sd, "dense0"),
            }
        elif params is None:
            params = self._random_params(seed)
        self.params = jax.tree.map(jnp.asarray, params)
        self._fwd = jax.jit(self._forward)
        self._fwd_batch = jax.jit(self._forward_batch)

    @staticmethod
    def _random_params(seed, dim_in=149, dim_out=28):
        rng = np.random.default_rng(seed)
        def lstm(i, h):
            mk = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
            one = lambda: {"wi": mk(i, 4 * h), "wh": mk(h, 4 * h),
                           "bi": mk(4 * h), "bh": mk(4 * h)}
            return {"fwd": one(), "bwd": one()}
        mk = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
        return {
            "emb": mk(dim_in, 288),
            "lstm0": lstm(288, 288),
            "bn0": {"scale": np.ones(576, np.float32),
                    "bias": np.zeros(576, np.float32),
                    "mean": np.zeros(576, np.float32),
                    "var": np.ones(576, np.float32)},
            "lstm1": lstm(576, 144),
            "lstm2": lstm(288, 96),
            "dense0": {"w": mk(192, dim_out), "b": mk(dim_out)},
        }

    def _forward(self, ids):
        p = self.params
        x = p["emb"][ids]
        x = _bilstm(p["lstm0"], x, hard_sigmoid)
        bn = p["bn0"]
        x = (x - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-3) * bn["scale"] \
            + bn["bias"]
        x = _bilstm(p["lstm1"], x, hard_sigmoid)
        x = _bilstm(p["lstm2"], x, hard_sigmoid)
        logits = x @ p["dense0"]["w"] + p["dense0"]["b"]
        return jax.nn.softmax(logits, axis=-1)

    def _forward_batch(self, ids, mask):
        p = self.params
        x = p["emb"][ids]
        m = mask.astype(x.dtype)
        x = _bilstm_batch(p["lstm0"], x, mask, hard_sigmoid)
        bn = p["bn0"]
        x = (x - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-3) * bn["scale"] \
            + bn["bias"]
        x = x * m[..., None]  # BN shifts pad rows; re-zero for lstm1 input
        x = _bilstm_batch(p["lstm1"], x, mask, hard_sigmoid)
        x = _bilstm_batch(p["lstm2"], x, mask, hard_sigmoid)
        logits = x @ p["dense0"]["w"] + p["dense0"]["b"]
        return jax.nn.softmax(logits, axis=-1)

    def _encode(self, text):
        unk = self.char_to_id["<UNK>"]
        return np.asarray([self.char_to_id.get(ch, unk) for ch in text],
                          np.int32)

    def _decode(self, text, probs):
        classes = probs.argmax(-1)
        out = []
        for ch, cls in zip(text, classes):
            haraka = self.id_to_class[int(cls)]
            if haraka in ("<UNK>", "ـ"):
                haraka = ""
            out.append(ch + haraka)
        return "".join(out)

    def predict(self, text: Union[str, List[str]], return_probs=False):
        if isinstance(text, list):
            if not text:
                return ([], []) if return_probs else []
            # ONE padded+masked batched forward for the whole list (one
            # device dispatch, one compile per 32-char length bucket) —
            # matches per-utterance results exactly (carry-hold masking)
            ids, mask = _pad_batch([self._encode(t) for t in text])
            probs = np.asarray(self._fwd_batch(ids, mask))
            outs = [(self._decode(t, probs[b, : len(t)]),
                     probs[b, : len(t)]) for b, t in enumerate(text)]
            return ([o[0] for o in outs], [o[1] for o in outs]) \
                if return_probs else [o[0] for o in outs]
        ids = self._encode(text)
        probs = np.asarray(self._fwd(jnp.asarray(ids)))
        result = self._decode(text, probs)
        return (result, probs) if return_probs else result


class Shakkelha:
    """Standard BiLSTM diacritizer."""

    def __init__(self, sd_path: Optional[str] = None, params=None, seed=0):
        vocab = _load_vocab("vocab_shakkelha.json")
        self.char_to_id = vocab["big_characters_mapping"]
        self.rev_classes = {int(k): v for k, v in
                            vocab["rev_classes_mapping"].items()}
        self.arabic_letters = set(vocab["arabic_letters"])
        self.diacritics = set(vocab["diacritics"])
        if sd_path is not None:
            from ..runtime.checkpoint import load_torch_state_dict
            sd = load_torch_state_dict(sd_path)
            sd.pop("__extras__", None)
            params = {
                "emb": sd["emb0.weight"],
                "lstm0": _import_bilstm(sd, "lstm0"),
                "lstm1": _import_bilstm(sd, "lstm1"),
                "dense0": _import_dense(sd, "dense0"),
                "dense1": _import_dense(sd, "dense1"),
                "dense2": _import_dense(sd, "dense2"),
            }
        elif params is None:
            params = self._random_params(seed)
        self.params = jax.tree.map(jnp.asarray, params)
        self._fwd = jax.jit(self._forward)
        self._fwd_batch = jax.jit(self._forward_batch)

    @staticmethod
    def _random_params(seed, dim_in=91, dim_out=19):
        rng = np.random.default_rng(seed)
        mk = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
        def lstm(i, h):
            one = lambda: {"wi": mk(i, 4 * h), "wh": mk(h, 4 * h),
                           "bi": mk(4 * h), "bh": mk(4 * h)}
            return {"fwd": one(), "bwd": one()}
        return {
            "emb": mk(dim_in, 25),
            "lstm0": lstm(25, 256),
            "lstm1": lstm(512, 256),
            "dense0": {"w": mk(512, 512), "b": mk(512)},
            "dense1": {"w": mk(512, 512), "b": mk(512)},
            "dense2": {"w": mk(512, dim_out), "b": mk(dim_out)},
        }

    def _forward(self, ids):
        p = self.params
        x = p["emb"][ids]
        x = _bilstm(p["lstm0"], x)
        x = _bilstm(p["lstm1"], x)
        x = jax.nn.relu(x @ p["dense0"]["w"] + p["dense0"]["b"])
        x = jax.nn.relu(x @ p["dense1"]["w"] + p["dense1"]["b"])
        return jax.nn.softmax(x @ p["dense2"]["w"] + p["dense2"]["b"], -1)

    def _forward_batch(self, ids, mask):
        p = self.params
        x = p["emb"][ids]
        x = _bilstm_batch(p["lstm0"], x, mask)
        x = _bilstm_batch(p["lstm1"], x, mask)
        x = jax.nn.relu(x @ p["dense0"]["w"] + p["dense0"]["b"])
        x = jax.nn.relu(x @ p["dense1"]["w"] + p["dense1"]["b"])
        return jax.nn.softmax(x @ p["dense2"]["w"] + p["dense2"]["b"], -1)

    def _strip_diacritics(self, text):
        return "".join(ch for ch in text if ch not in self.diacritics)

    def _encode(self, stripped):
        unk = self.char_to_id["<UNK>"]
        ids = [self.char_to_id["<SOS>"]]
        ids += [self.char_to_id.get(ch, unk) for ch in stripped]
        ids.append(self.char_to_id["<EOS>"])
        return np.asarray(ids, np.int32)

    def _decode(self, stripped, probs):
        body = probs[1:]  # drop <SOS> position
        out = []
        for ch, pr in zip(stripped, body):
            out.append(ch)
            if ch not in self.arabic_letters:
                continue
            cls = self.rev_classes[int(pr.argmax())]
            if "<" in cls:
                continue
            out.append(cls)
        return "".join(out)

    def predict(self, text: Union[str, List[str]], return_probs=False):
        if isinstance(text, list):
            if not text:
                return ([], []) if return_probs else []
            stripped = [self._strip_diacritics(t) for t in text]
            ids, mask = _pad_batch([self._encode(s) for s in stripped])
            probs = np.asarray(self._fwd_batch(ids, mask))
            outs = [(self._decode(s, probs[b, : len(s) + 2]),
                     probs[b, : len(s) + 2]) for b, s in enumerate(stripped)]
            return ([o[0] for o in outs], [o[1] for o in outs]) \
                if return_probs else [o[0] for o in outs]
        stripped = self._strip_diacritics(text)
        probs = np.asarray(self._fwd(jnp.asarray(self._encode(stripped))))
        result = self._decode(stripped, probs)
        return (result, probs) if return_probs else result


def load_vowelizer(name: str, config=None):
    """Factory (reference `models/diacritizers/__init__.py:4-12`): name ->
    loaded model, weight paths from the config (`shakkala_path`,
    `shakkelha_path` in configs/basic.yaml)."""
    if config is None:
        from ..runtime.config import get_basic_config
        config = get_basic_config()
    if name == "shakkala":
        path = config.get_path("shakkala_path")
        return Shakkala(sd_path=str(path) if path.exists() else None)
    if name == "shakkelha":
        path = config.get_path("shakkelha_path")
        return Shakkelha(sd_path=str(path) if path.exists() else None)
    raise ValueError(f"unknown vowelizer '{name}' "
                     "(options: shakkala, shakkelha)")
