"""Tacotron2 pipeline tests (random weights, small config)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tts_arabic_tpu.infer import Tacotron2Wave
from tts_arabic_tpu.infer.tacotron_pipeline import (needs_postprocessing,
                                                    resize_mel, truncate_mel)
from tts_arabic_tpu.models.tacotron2 import Tacotron2Config

SMALL = Tacotron2Config(
    n_symbols=40, symbol_embedding_dim=32, encoder_embedding_dim=32,
    num_speakers=1, decoder_rnn_dim=48, attention_rnn_dim=48,
    attention_hidden_dim=16, attention_location_n_filters=4,
    attention_location_kernel_size=7, prenet_dim=16,
    postnet_embedding_dim=32, postnet_n_convolutions=3, n_mels=80,
    decoder_max_step=96)

ARABIC = "ذَهَبَ الوَلَدُ"


@pytest.fixture(scope="module")
def pipe():
    p = Tacotron2Wave(seed=0, config=SMALL)
    p.model.decoder_max_step = 96
    # random gates hover near 0.5; push below threshold so decoding runs,
    # and rely on max_steps to stop
    p.model.variables["params"]["gate_layer"]["bias"] = jnp.asarray([-2.0])
    return p


def test_ttmel_single(pipe):
    mel = pipe.model.ttmel_single(ARABIC)
    assert mel.ndim == 2 and mel.shape[0] == 80
    assert 1 <= mel.shape[1] <= 96 + 3
    assert np.isfinite(mel).all()


def test_tts_wave_and_batch(pipe):
    waves = pipe.tts([ARABIC, "صِفر"], batch_size=2, denoise=0.0)
    assert len(waves) == 2
    for w in waves:
        assert w.ndim == 1 and len(w) % 256 == 0 and np.isfinite(w).all()


def test_bf16_decode_close_to_f32(pipe):
    """compute_dtype=bfloat16 runs the whole autoregressive decode in bf16
    and must stay finite and close to the f32 pipeline on the same
    weights (the TPU fast path; docs/PERF.md)."""
    bp = Tacotron2Wave(seed=0, config=SMALL, compute_dtype=jnp.bfloat16)
    bp.model.decoder_max_step = 96
    bp.model.variables = pipe.model.variables
    ref = pipe.model.ttmel_single(ARABIC, postprocess_mel=False)
    got = bp.model.ttmel_single(ARABIC, postprocess_mel=False)
    assert got.dtype == np.float32 and np.isfinite(got).all()
    n = min(ref.shape[1], got.shape[1])
    assert n >= 1 and abs(ref.shape[1] - got.shape[1]) <= 8
    err = np.sqrt(np.mean((ref[:, :n] - got[:, :n]) ** 2))
    scale = np.sqrt(np.mean(ref[:, :n] ** 2)) + 1e-9
    assert err / scale < 0.15, err / scale


def test_speed_resize(pipe):
    slow = pipe.model.ttmel_single(ARABIC, speed=0.5)
    fast = pipe.model.ttmel_single(ARABIC, speed=2.0)
    # same utterance decoded once; resize changes frame count inversely
    assert slow.shape[1] > fast.shape[1]


def test_stream_matches_tts_single(pipe):
    """Streamed chunks concatenated must equal the batch pipeline's wave
    (postprocess_mel=False) to float tolerance: same decode steps, same
    rng, margins >= every receptive field, batch-identical padding."""
    ref = pipe.tts_single(ARABIC, denoise=0.004, postprocess_mel=False)
    chunks = list(pipe.stream(ARABIC, chunk_frames=32, denoise=0.004))
    got = np.concatenate(chunks)
    assert len(chunks) >= 2  # actually exercised segmentation
    assert got.shape == ref.shape
    # window programs fuse differently than the bucket program, so float
    # rounding differs by ~1e-5 (-90 dB); 1e-4 is far below audibility
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=0)


def test_stream_caps_at_decoder_max_step(pipe):
    """When decoder_max_step is not a multiple of chunk_frames and the gate
    never fires, stream() must stop exactly at decoder_max_step like
    tts_single() — not over-decode up to chunk_frames-1 extra frames."""
    old = pipe.model.decoder_max_step
    pipe.model.decoder_max_step = 90  # not a multiple of 32
    try:
        ref = pipe.tts_single(ARABIC, denoise=0.0, postprocess_mel=False)
        got = np.concatenate(
            list(pipe.stream(ARABIC, chunk_frames=32, denoise=0.0)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=0)
    finally:
        pipe.model.decoder_max_step = old


def test_stream_bf16(pipe):
    bp = Tacotron2Wave(seed=0, config=SMALL, compute_dtype=jnp.bfloat16)
    bp.model.decoder_max_step = 96
    bp.model.variables = pipe.model.variables
    chunks = list(bp.stream(ARABIC, chunk_frames=48, denoise=0.0))
    w = np.concatenate(chunks)
    assert w.dtype == np.float32 and np.isfinite(w).all() and len(w) > 0


def test_fused_list_path_matches_host_path(pipe):
    """tts(list) uses the fused device program (decode -> in-graph EOS
    truncation -> vocode, waves-only D2H); it must reproduce the host
    per-utterance path (numpy truncate_mel + separate vocode) to float
    tolerance, including the postprocess truncation lengths."""
    texts = [ARABIC, "صِفر", "كِتاب"]
    host = [pipe.tts_single(t, denoise=0.004) for t in texts]
    fused = pipe.tts(texts, denoise=0.004, batch_size=2)
    assert len(fused) == len(host)
    for h, f in zip(host, fused):
        assert f.shape == h.shape  # same truncation decisions
        np.testing.assert_allclose(f, h, atol=2e-4, rtol=0)

    # int16 device conversion: same waves, PCM-quantized
    pcm = pipe.tts(texts, denoise=0.004, batch_size=2, out_int16=True)
    for h, p in zip(host, pcm):
        assert p.dtype == np.int16 and p.shape == h.shape
        np.testing.assert_allclose(p / 32767.0, h, atol=2e-4, rtol=0)


def test_warmup_precompiles_fused_path(pipe):
    """warmup() must run the fused signatures end-to-end (compile +
    execute) and leave results identical afterwards."""
    before = pipe.tts([ARABIC], denoise=0.004)[0]
    pipe.warmup(batch_sizes=(1,), text_buckets=(16,), denoise=0.004)
    after = pipe.tts([ARABIC], denoise=0.004)[0]
    np.testing.assert_array_equal(before, after)


def test_needs_postprocessing_rules():
    assert not needs_postprocessing("a")
    assert not needs_postprocessing("m")
    assert needs_postprocessing("b")
    assert needs_postprocessing("_+_")


def test_truncate_mel():
    mel = np.arange(80 * 20, dtype=np.float32).reshape(80, 20)
    attn = np.zeros(20, np.float32)
    attn[12:] = 1.0
    cut = truncate_mel(mel, attn)
    assert cut.shape[1] == 12 + 3
    np.testing.assert_array_equal(cut[:, -1], cut[:, -4])  # replicate pad


def test_resize_mel_identity_and_rate():
    mel = np.random.default_rng(0).standard_normal((80, 40)).astype(
        np.float32)
    assert resize_mel(mel, 1.0) is mel
    out = resize_mel(mel, 2.0)
    assert out.shape == (80, 20)


def test_tts_mulaw_output(pipe):
    """out_int16="mulaw" on the fused Tacotron2 path: uint8 companded
    waves decoding to the f32 output at telephony-grade SNR."""
    from tts_arabic_tpu.audio import mulaw_decode

    texts = ["صِفر", "كِتاب"]
    ref = pipe.tts(texts, denoise=0.004, batch_size=2)
    got = pipe.tts(texts, denoise=0.004, batch_size=2, out_int16="mulaw")
    for r, g in zip(ref, got):
        assert g.dtype == np.uint8 and g.shape == r.shape
        back = mulaw_decode(g)
        err = np.mean((back - r) ** 2)
        sig = np.mean(r ** 2) + 1e-12
        assert 10 * np.log10(sig / (err + 1e-12)) > 25.0


def test_host_list_path_honors_out_int16(pipe):
    """tts(list, speed=...) takes the non-fused host path; out_int16 must
    still convert on device (regression: it used to be silently dropped)."""
    texts = ["صِفر", "كِتاب"]
    ref = pipe.tts(texts, speed=0.9, denoise=0.004, batch_size=2)
    pcm = pipe.tts(texts, speed=0.9, denoise=0.004, batch_size=2,
                   out_int16=True)
    for r, p in zip(ref, pcm):
        assert p.dtype == np.int16 and p.shape == r.shape
        np.testing.assert_allclose(p / 32767.0, r, atol=2e-4, rtol=0)


def test_tts_trailing_punctuation_graceful(pipe):
    """VERDICT r3 #5: Tacotron2 path handles sentence-final punctuation
    (token-level sanitize keeps the EOS-postprocess attention index
    consistent with the id sequence); strict_text=True restores the
    reference KeyError (text/__init__.py:24-27)."""
    w = pipe.tts("كيف حالك؟", denoise=0.0)
    assert w.ndim == 1 and len(w) > 0 and np.isfinite(w).all()
    w_dot = pipe.tts(ARABIC + ".", denoise=0.0)
    w_bare = pipe.tts(ARABIC, denoise=0.0)
    assert w_dot.shape == w_bare.shape
    np.testing.assert_allclose(w_dot, w_bare, atol=1e-5)

    strict = Tacotron2Wave(seed=0, config=SMALL, strict_text=True)
    with pytest.raises(KeyError):
        strict.model.tokenize(ARABIC + ".")
