"""AOT serving bundles: `jax.export` StableHLO programs with baked weights.

    python -m tts_arabic_tpu.apps.export_serving --out bundle/ \
        [--checkpoint pretrained/fastpitch_ar_adv.pth] [--platforms tpu,cpu]

The reference ecosystem publishes ONNX exports of these models (its
README links the `tts_arabic` package / ONNX models); this is the
TPU-native analogue. Each (batch, text-bucket) encode program and each
mel-bucket wave program (decoder + vocoder + denoiser + int16, one fused
graph) is exported via `jax.export` with the model weights BAKED into
the artifact — a serving process needs only this bundle and the pure-
Python text frontend: no checkpoint files, no model-construction code,
no tracing, and (per StableHLO's compatibility guarantees) no
same-jax-version requirement. `--platforms tpu` cross-lowers for TPU
from any host, so bundles can be built on CPU CI and shipped to pods.

Load with `ServingBundle(dir)`: a minimal two-phase pipeline (encode ->
one scalar sync -> wave) mirroring `infer/pipeline.py`'s serving path.
"""
from __future__ import annotations

import argparse
import json
import pathlib
from typing import List, Optional, Sequence

import numpy as np

HOP = 256


def _enc_name(bs: int, tb: int) -> str:
    return f"encode_b{bs}_t{tb}.shlo"


def _wave_name(bs: int, mb: int) -> str:
    return f"wave_b{bs}_m{mb}.shlo"


def export_bundle(out_dir, checkpoint: Optional[str] = None, *,
                  batch_sizes: Sequence[int] = (1,),
                  text_buckets: Sequence[int] = (16, 32, 64),
                  mel_buckets: Sequence[int] = (256, 512, 1024),
                  platforms: Optional[Sequence[str]] = None,
                  seed: int = 0) -> pathlib.Path:
    """Export encode/wave programs for every signature; returns the dir."""
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from ..infer.pipeline import FastPitch2Wave

    pipe = FastPitch2Wave(checkpoint, seed=seed, arabic_in=False,
                          compute_dtype=jnp.bfloat16)
    m = pipe.model
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    kw = dict(platforms=list(platforms)) if platforms else {}

    i32 = jnp.int32
    f32 = jnp.float32
    for bs in batch_sizes:
        for tb in text_buckets:
            fn = jax.jit(lambda tokens, pm, pa, spk, pace: m._encode_fn(
                m.variables, tokens, pm, pa, spk, pace))
            exp = jex.export(fn, **kw)(
                jax.ShapeDtypeStruct((bs, tb), i32),
                jax.ShapeDtypeStruct((), f32), jax.ShapeDtypeStruct((), f32),
                jax.ShapeDtypeStruct((), i32), jax.ShapeDtypeStruct((), f32))
            (out / _enc_name(bs, tb)).write_bytes(exp.serialize())

        d_model = m.config.d_model
        for mb in mel_buckets:
            def wave_fn(enc_out, durations, denoise, pace, _mb=mb):
                wave, _, mel_lens = pipe._wave_fn(
                    m.variables, pipe.vocoder_vars, pipe.bias_spec,
                    enc_out, durations, denoise, pace, max_frames=_mb,
                    use_denoiser=True, return_mel=False, out_int16=True)
                return wave, mel_lens
            # text axis of enc_out uses the LARGEST text bucket; smaller
            # token batches pad up to it before the wave call (the
            # regulator ignores zero-duration pad tokens)
            tbx = max(text_buckets)
            exp = jex.export(jax.jit(wave_fn), **kw)(
                jax.ShapeDtypeStruct((bs, tbx, d_model), f32),
                jax.ShapeDtypeStruct((bs, tbx), f32),
                jax.ShapeDtypeStruct((), f32), jax.ShapeDtypeStruct((), f32))
            (out / _wave_name(bs, mb)).write_bytes(exp.serialize())

    (out / "manifest.json").write_text(json.dumps({
        "format": 1,
        "model": "fastpitch2wave",
        "sample_rate": pipe.sample_rate,
        "hop_length": HOP,
        "batch_sizes": list(batch_sizes),
        "text_buckets": list(text_buckets),
        "mel_buckets": list(mel_buckets),
        "platforms": list(platforms) if platforms else ["default"],
    }, indent=1))
    return out


class ServingBundle:
    """Load an exported bundle and serve `tts()` from it — no weights, no
    model code, no tracing (programs are AOT-compiled at first call and
    cached by jax)."""

    def __init__(self, bundle_dir):
        from jax import export as jex

        self.dir = pathlib.Path(bundle_dir)
        self.manifest = json.loads((self.dir / "manifest.json").read_text())
        self._progs = {}
        self._jex = jex

    def _load(self, name):
        if name not in self._progs:
            self._progs[name] = self._jex.deserialize(
                (self.dir / name).read_bytes())
        return self._progs[name]

    @staticmethod
    def _bucket(n, ladder):
        for b in sorted(ladder):
            if n <= b:
                return b
        return max(ladder)

    def tts(self, texts: List[str], denoise: float = 0.005,
            speed: float = 1.0, speaker_id: int = 0,
            pitch_mul: float = 1.0, pitch_add: float = 0.0):
        """Buckwalter/phonetic inputs -> list of int16 waveforms."""
        import jax.numpy as jnp

        from ..text import buckwalter_to_tokens, tokens_to_ids

        man = self.manifest
        ids = [np.asarray(tokens_to_ids(buckwalter_to_tokens(
            t, append_space=False)), np.int32) for t in texts]
        if len(ids) > max(man["batch_sizes"]):
            raise ValueError(
                f"{len(ids)} texts > largest exported batch "
                f"{max(man['batch_sizes'])}; split the list or re-export "
                f"with larger --batch-sizes")
        if max(len(i) for i in ids) > max(man["text_buckets"]):
            raise ValueError(
                "input longer than the largest exported text bucket "
                f"({max(man['text_buckets'])} tokens); re-export with "
                "larger --text-buckets")
        bs = self._bucket(len(ids), man["batch_sizes"])
        tb = self._bucket(max(len(i) for i in ids), man["text_buckets"])
        tbx = max(man["text_buckets"])
        tokens = np.zeros((bs, tb), np.int32)
        for r, i in enumerate(ids):
            tokens[r, : len(i)] = i
        enc = self._load(_enc_name(bs, tb)).call(
            jnp.asarray(tokens), jnp.float32(pitch_mul),
            jnp.float32(pitch_add), jnp.int32(speaker_id),
            jnp.float32(speed))
        dec_len = int(enc["dec_len_max"])
        if dec_len > max(man["mel_buckets"]):
            raise ValueError(
                f"predicted mel length {dec_len} > largest exported mel "
                f"bucket {max(man['mel_buckets'])}; the output would be "
                "truncated — re-export with larger --mel-buckets")
        mb = self._bucket(dec_len, man["mel_buckets"])
        enc_out = np.zeros((bs, tbx, enc["enc_out"].shape[-1]), np.float32)
        enc_out[:, :tb] = np.asarray(enc["enc_out"], np.float32)
        durs = np.zeros((bs, tbx), np.float32)
        durs[:, :tb] = np.asarray(enc["dur_pred"], np.float32)
        wave, mel_lens = self._load(_wave_name(bs, mb)).call(
            jnp.asarray(enc_out), jnp.asarray(durs),
            jnp.float32(denoise), jnp.float32(speed))
        wave = np.asarray(wave)
        lens = np.asarray(mel_lens)
        return [wave[r, : int(lens[r]) * man["hop_length"]]
                for r in range(len(ids))]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="fastpitch",
                   choices=["fastpitch", "tacotron2"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. tpu,cpu "
                        "(default: current backend)")
    p.add_argument("--batch-sizes", default="1")
    p.add_argument("--text-buckets", default="16,32,64")
    p.add_argument("--mel-buckets", default="256,512,1024")
    p.add_argument("--max-steps", type=int, default=768,
                   help="tacotron2 decode bound (frames)")
    a = p.parse_args(argv)
    ints = lambda s: tuple(int(x) for x in s.split(","))
    plats = a.platforms.split(",") if a.platforms else None
    if a.model == "tacotron2":
        out = export_bundle_tacotron(
            a.out, a.checkpoint, batch_sizes=ints(a.batch_sizes),
            text_buckets=ints(a.text_buckets),
            mel_buckets=ints(a.mel_buckets), max_steps=a.max_steps,
            platforms=plats)
    else:
        out = export_bundle(
            a.out, a.checkpoint, batch_sizes=ints(a.batch_sizes),
            text_buckets=ints(a.text_buckets),
            mel_buckets=ints(a.mel_buckets), platforms=plats)
    n = len(list(out.glob("*.shlo")))
    print(f"exported {n} programs -> {out}")


if __name__ == "__main__":
    main()


# --- Tacotron2 bundles ------------------------------------------------------

def _t2_dec_name(bs: int, tb: int) -> str:
    return f"t2_decode_b{bs}_t{tb}.shlo"


def _t2_wave_name(bs: int, mb: int) -> str:
    return f"t2_wave_b{bs}_m{mb}.shlo"


def export_bundle_tacotron(out_dir, checkpoint: Optional[str] = None, *,
                           batch_sizes: Sequence[int] = (1,),
                           text_buckets: Sequence[int] = (32, 64),
                           mel_buckets: Sequence[int] = (256, 512),
                           max_steps: int = 768,
                           platforms: Optional[Sequence[str]] = None,
                           seed: int = 0) -> pathlib.Path:
    """Tacotron2 fused-path bundle: one autoregressive decode->EOS-truncate
    program per (batch, text-bucket) and one assemble->vocode->int16
    program per (batch, mel-bucket). The prenet-dropout rng is BAKED to
    PRNGKey(0) — exactly the pipeline's default — so bundles are
    deterministic."""
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from ..infer.tacotron_pipeline import Tacotron2Wave

    pipe = Tacotron2Wave(checkpoint, seed=seed, arabic_in=False,
                         compute_dtype=jnp.bfloat16)
    m = pipe.model
    rng = jax.random.PRNGKey(0)
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    kw = dict(platforms=list(platforms)) if platforms else {}

    i32, f32 = jnp.int32, jnp.float32
    for bs in batch_sizes:
        for tb in text_buckets:
            def dec_fn(tokens, lens, trunc, post, speaker, _ms=max_steps):
                o = m._infer_fn(m.variables, tokens, lens,
                                jnp.full((tokens.shape[0],), speaker, i32),
                                rng, max_steps=_ms)
                n_end, new_len = pipe._newlen_fn(
                    o["alignments"], o["mel_lens"], trunc, post)
                return o["mel_postnet"], n_end, new_len
            exp = jex.export(jax.jit(dec_fn), **kw)(
                jax.ShapeDtypeStruct((bs, tb), i32),
                jax.ShapeDtypeStruct((bs,), i32),
                jax.ShapeDtypeStruct((bs,), i32),
                jax.ShapeDtypeStruct((bs,), jnp.bool_),
                jax.ShapeDtypeStruct((), i32))
            (out / _t2_dec_name(bs, tb)).write_bytes(exp.serialize())

        for mb in mel_buckets:
            def wave_fn(mel_post, n_end, new_len, post, denoise, _mb=mb):
                mel_proc = pipe._assemble_fn(mel_post, n_end, new_len, post,
                                             bucket=_mb)
                return pipe._vocode_fn(
                    pipe.vocoder_vars, pipe.bias_spec, mel_proc, denoise,
                    use_denoiser=True, out_int16=True)
            exp = jex.export(jax.jit(wave_fn), **kw)(
                jax.ShapeDtypeStruct((bs, max_steps, m.config.n_mels), f32),
                jax.ShapeDtypeStruct((bs,), i32),
                jax.ShapeDtypeStruct((bs,), i32),
                jax.ShapeDtypeStruct((bs,), jnp.bool_),
                jax.ShapeDtypeStruct((), f32))
            (out / _t2_wave_name(bs, mb)).write_bytes(exp.serialize())

    (out / "manifest.json").write_text(json.dumps({
        "format": 1,
        "model": "tacotron2wave",
        "sample_rate": pipe.sample_rate,
        "hop_length": HOP,
        "max_steps": max_steps,
        "batch_sizes": list(batch_sizes),
        "text_buckets": list(text_buckets),
        "mel_buckets": list(mel_buckets),
        "platforms": list(platforms) if platforms else ["default"],
    }, indent=1))
    return out


class Tacotron2ServingBundle:
    """Serve Tacotron2 from an exported bundle (fused decode -> truncate ->
    vocode; int16 output; same EOS postprocessing as the live pipeline)."""

    def __init__(self, bundle_dir):
        from jax import export as jex

        self.dir = pathlib.Path(bundle_dir)
        self.manifest = json.loads((self.dir / "manifest.json").read_text())
        assert self.manifest["model"] == "tacotron2wave", self.manifest
        self._progs = {}
        self._jex = jex

    def _load(self, name):
        if name not in self._progs:
            self._progs[name] = self._jex.deserialize(
                (self.dir / name).read_bytes())
        return self._progs[name]

    def tts(self, texts: List[str], denoise: float = 0.005,
            speaker_id: int = 0, postprocess_mel: bool = True):
        import jax.numpy as jnp

        from ..infer.tacotron_pipeline import N_EOS, needs_postprocessing
        from ..text import (SEPARATOR, buckwalter_to_tokens, tokens_to_ids)

        man = self.manifest
        toks_list, post = [], []
        for t in texts:
            toks = buckwalter_to_tokens(t)
            p = postprocess_mel and needs_postprocessing(toks[-N_EOS - 1])
            if p:
                toks.insert(-N_EOS, SEPARATOR)
            toks_list.append(toks)
            post.append(p)
        ids = [np.asarray(tokens_to_ids(t), np.int32) for t in toks_list]
        if len(ids) > max(man["batch_sizes"]):
            raise ValueError(f"{len(ids)} texts > largest exported batch")
        if max(len(i) for i in ids) > max(man["text_buckets"]):
            raise ValueError("input longer than largest exported text "
                             "bucket")
        bs = ServingBundle._bucket(len(ids), man["batch_sizes"])
        tb = ServingBundle._bucket(max(len(i) for i in ids),
                                   man["text_buckets"])
        tokens = np.zeros((bs, tb), np.int32)
        lens = np.ones((bs,), np.int32)
        trunc = np.zeros((bs,), np.int32)
        postv = np.zeros((bs,), bool)
        for r, (i, tk, p) in enumerate(zip(ids, toks_list, post)):
            tokens[r, : len(i)] = i
            lens[r] = len(i)
            trunc[r] = len(tk) - N_EOS - 1
            postv[r] = p
        mel_post, n_end, new_len = self._load(_t2_dec_name(bs, tb)).call(
            jnp.asarray(tokens), jnp.asarray(lens), jnp.asarray(trunc),
            jnp.asarray(postv), jnp.int32(speaker_id))
        new_lens = np.asarray(new_len)
        need = int(new_lens[: len(ids)].max())
        if need > max(man["mel_buckets"]):
            raise ValueError(f"decoded length {need} > largest exported "
                             "mel bucket; re-export with larger "
                             "--mel-buckets")
        mb = ServingBundle._bucket(need, man["mel_buckets"])
        wave = np.asarray(self._load(_t2_wave_name(bs, mb)).call(
            jnp.asarray(np.asarray(mel_post), np.float32),
            jnp.asarray(n_end), jnp.asarray(new_len), jnp.asarray(postv),
            jnp.float32(denoise)))
        hop = man["hop_length"]
        return [wave[r, : int(new_lens[r]) * hop] for r in range(len(ids))]
