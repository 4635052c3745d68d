"""Compile-count regression tests (SURVEY.md §4 item 3): every jitted
pipeline phase must compile once per bucket signature and never again for
repeated or control-value-changed calls."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.infer import FastPitch2Wave
from tts_arabic_tpu.models.fastpitch import FastPitchConfig

SMALL = FastPitchConfig(
    d_model=32, enc_n_layers=1, dec_n_layers=1, enc_d_head=8, dec_d_head=8,
    enc_filter_size=64, dec_filter_size=64, dur_filter_size=16,
    pitch_filter_size=16, energy_filter_size=16, attn_channels=8)


@pytest.fixture(scope="module")
def pipe():
    p = FastPitch2Wave(seed=0, config=SMALL)
    fc = p.model.variables["params"]["duration_predictor"]["fc"]
    fc["bias"] = fc["bias"] + 1.5
    return p


def _traces(jitted):
    return jitted._cache_size()


def test_control_values_do_not_recompile(pipe):
    texts = ["صِفر", "واحِد"]
    # warm all speed variants once (speed changes mel length, which may
    # legitimately select a different mel bucket = a new signature)
    for speed in (1.0, 1.3, 0.7):
        pipe.tts(texts, batch_size=2, denoise=0.0, speed=speed)
    enc_before = _traces(pipe.model._encode_jit)
    wave_before = _traces(pipe._wave_jit)
    # changing dynamic controls must hit the same compiled programs
    pipe.tts(texts, batch_size=2, denoise=0.0, speed=1.3, pitch_mul=1.2,
             pitch_add=-0.4)
    pipe.tts(texts, batch_size=2, denoise=0.0, speed=0.7, pitch_add=0.5,
             speaker_id=0)
    pipe.tts(texts, batch_size=2, denoise=0.0)
    assert _traces(pipe.model._encode_jit) == enc_before
    assert _traces(pipe._wave_jit) == wave_before


def test_partial_batches_reuse_signature(pipe):
    texts = ["صِفر", "واحِد", "إِثنان"]
    pipe.tts(texts, batch_size=2, denoise=0.0)  # batches of 2 then 1 (padded)
    enc_before = _traces(pipe.model._encode_jit)
    pipe.tts(texts[:1] * 4, batch_size=2, denoise=0.0)
    assert _traces(pipe.model._encode_jit) == enc_before


def test_warmup_precompiles_signatures():
    """After warmup(), requests that land on warmed buckets add no new
    traces."""
    import jax.numpy as jnp
    from tts_arabic_tpu.infer import FastPitch2Wave

    pipe = FastPitch2Wave(seed=0, arabic_in=False)
    fc = pipe.model.variables["params"]["duration_predictor"]["fc"]
    fc["bias"] = fc["bias"] + 2.0
    pipe.warmup(batch_sizes=(2,), text_buckets=(16,),
                mel_buckets=(64, 128, 192, 256))

    enc_before = _traces(pipe.model._encode_jit)
    wave_before = _traces(pipe._wave_jit)
    pipe.tts(["bisomi {ll~ahi", ">aholFA"], batch_size=2)
    assert _traces(pipe.model._encode_jit) == enc_before
    assert _traces(pipe._wave_jit) == wave_before
