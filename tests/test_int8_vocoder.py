"""Static-calibrated int8 HiFi-GAN serving path (ops/hifigan_int8.py).

The reference has no quantized path (fp32 serving,
`vocoder/hifigan/models.py:86-136`); these tests pin the int8 machinery:
exact int32 accumulation vs a f32 fake-quant oracle, calibration-pass
transparency, PTQ-grade SNR of the full mixed generator, and the
pipeline opt-in."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.ops.hifigan_int8 import (
    collect_mrf_scales, generator_apply_int8, int8_conv_static, _StatsMRF)
from tts_arabic_tpu.ops.hifigan_pallas import generator_apply_pallas
from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig

CFG = HiFiGANConfig()  # full 512-channel production config


def _mel(rng, b=2, t=16):
    # smooth log-mel-like input in the real dynamic range
    m = rng.standard_normal((b, t, 80)).astype(np.float32)
    m = m + np.linspace(-2, 2, 80)[None, None, :]
    return jnp.asarray(m * 1.5 - 5.0)


def _snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    return 10 * np.log10((ref ** 2).sum() / max((err ** 2).sum(), 1e-30))


def test_int8_conv_matches_fake_quant_oracle():
    """int8_conv_static == the f32 fake-quant conv (round inputs/weights to
    the int8 grid, convolve in float) to accumulation tolerance: the int32
    accumulation is exact, so the grids are the only approximation."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 64, 48)) * 3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 48, 48)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(48), jnp.float32)
    ascale = float(jnp.max(jnp.abs(y))) / 127.0
    for dil in (1, 3, 5):
        got = int8_conv_static(y, w, b, dil, ascale)
        wmax = jnp.max(jnp.abs(w), axis=(0, 1))
        wscale = jnp.maximum(wmax, 1e-12) / 127.0
        wq = jnp.clip(jnp.round(w / wscale), -127, 127) * wscale
        yq = jnp.clip(jnp.round(y / ascale), -127, 127) * ascale
        pad = 6 * dil // 2
        ref = jax.lax.conv_general_dilated(
            yq, wq, (1,), [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=("NHC", "HIO", "NHC")) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_calibration_pass_is_transparent():
    """The stats-collecting forward must not perturb activations: its
    output equals Generator.apply (same float convs, max-abs is a pure
    observer)."""
    rng = np.random.default_rng(1)
    mel = _mel(rng)
    gen = Generator(CFG)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    ref = gen.apply(variables, mel)
    hook = _StatsMRF(min_ch=64)
    got = generator_apply_pallas(variables, mel, CFG, strategy="xla",
                                 resblock_override=hook)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_calibrated_sites_cover_every_claimed_conv():
    """min_ch=64 claims stages 0-2 (C=256/128/64): 3 stages x 3 blocks x
    3 dilations x 2 convs = 54 sites, and the int8 pass consumes exactly
    those keys (a missing site KeyErrors at trace time, so coverage is
    structural, not statistical)."""
    rng = np.random.default_rng(2)
    mel = _mel(rng)
    variables = Generator(CFG).init(jax.random.PRNGKey(0), mel)
    scales = collect_mrf_scales(variables, mel, CFG, min_ch=64)
    assert len(scales) == 54
    assert all(v > 0 for v in scales.values())
    incomplete = dict(scales)
    incomplete.pop("s2b2c2d2")
    with pytest.raises(KeyError):
        generator_apply_int8(variables, mel, CFG, incomplete, min_ch=64)


def test_int8_generator_snr_and_fallback_stages_exact():
    """Full production config, min_ch=64: PTQ-grade SNR vs the float
    generator on calibrated inputs AND on fresh same-distribution inputs;
    the unclaimed C=32 stage + conv_pre/post/upsamples stay float (checked
    by min_ch > max width == plain path)."""
    rng = np.random.default_rng(3)
    mel = _mel(rng)
    gen = Generator(CFG)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    scales = collect_mrf_scales(variables, mel, CFG, min_ch=64)

    ref = np.asarray(gen.apply(variables, mel))
    q = np.asarray(generator_apply_int8(variables, mel, CFG, scales))
    assert q.shape == ref.shape
    snr = _snr_db(ref, q)
    assert snr > 30, snr  # measured ~40 dB; PTQ-grade bar with margin

    fresh = _mel(np.random.default_rng(99), b=1, t=24)
    snr2 = _snr_db(gen.apply(variables, fresh),
                   generator_apply_int8(variables, fresh, CFG, scales))
    assert snr2 > 25, snr2

    # min_ch above every width claims nothing -> bitwise the plain path
    nothing = generator_apply_int8(variables, mel, CFG, {}, min_ch=512)
    plain = generator_apply_pallas(variables, mel, CFG, strategy="auto")
    np.testing.assert_array_equal(np.asarray(nothing), np.asarray(plain))


def test_min_ch_guard_protects_packed_stage():
    with pytest.raises(AssertionError):
        collect_mrf_scales({}, jnp.zeros((1, 4, 80)), CFG, min_ch=32)


def test_pipeline_calibrate_int8_end_to_end():
    """FastPitch2Wave.calibrate_int8(): the default-text auto-calibration
    runs, tts() switches to the int8 path — vocoder MRF AND decoder FFN
    (texts path => ffn auto-on; encoder stays float so mel lengths are
    unchanged) — output stays PTQ-close to the float pipeline, and
    stream() matches tts_single under the new path."""
    from tts_arabic_tpu.infer.pipeline import FastPitch2Wave
    pipe = FastPitch2Wave(seed=0, arabic_in=False)
    text = ">atAHat lilbA}iEi lmutajaw~ili >an yakuwna jA*iban"
    ref = pipe.tts_single(text, denoise=0.0)
    scales = pipe.calibrate_int8()
    assert pipe._int8_scales is scales and len(scales) == 54
    assert pipe._ffn_quant is not None
    assert len(pipe._ffn_quant["decoder"]) == pipe.model.config.dec_n_layers
    q = pipe.tts_single(text, denoise=0.0)
    assert q.shape == ref.shape  # float duration head => same lengths
    assert _snr_db(ref, q) > 20
    # streaming shares _voc_apply AND the quantized decode: chunks must
    # match the batched int8 path
    streamed = np.concatenate(list(pipe.stream(text, denoise=0.0)))
    np.testing.assert_allclose(streamed, q, atol=2e-4)
    # mels-path calibration cannot cover the FFN: explicit ffn=True raises
    with pytest.raises(ValueError, match="texts path"):
        pipe.calibrate_int8(mels=np.zeros((1, 16, 80), np.float32),
                            ffn=True)


def test_convffn_int8_quant_collection():
    """FFTransformer with a read-only "quant" collection: calib sow ->
    scales -> quantized apply stays close to float, and padded positions
    still quantize to exact zeros (bucket invariance preserved)."""
    from tts_arabic_tpu.models.layers import FFTransformer
    m = FFTransformer(n_layer=2, n_head=1, d_model=64, d_head=64,
                      d_inner=256, kernel_size=3, dropout=0.1, dropatt=0.1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 64)), jnp.float32)
    lens = jnp.asarray([24, 17])
    variables = m.init(jax.random.PRNGKey(0), x, lens)
    assert sorted(variables.keys()) == ["params"]  # no calib leak at init
    ref, _ = m.apply(variables, x, lens)
    (_, _), aux = m.apply(variables, x, lens, mutable=["calib"])
    qt = {
        layer: {"ff": {"ffn_ascale": jnp.asarray(
            [float(c["ff"]["ffn_amax1"]) / 127.0,
             float(c["ff"]["ffn_amax2"]) / 127.0], jnp.float32)}}
        for layer, c in aux["calib"].items()}
    q, _ = m.apply({**variables, "quant": qt}, x, lens)
    assert _snr_db(np.asarray(ref), np.asarray(q)) > 25
    # same inputs at a longer bucket: real positions identical (the pad
    # rows quantize to exact zeros, like the float path's masking)
    x2 = jnp.pad(x, ((0, 0), (0, 8), (0, 0)))
    q2, _ = m.apply({**variables, "quant": qt}, x2, lens)
    np.testing.assert_allclose(np.asarray(q2)[:, :24], np.asarray(q),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_rejects_bad_quantize_modes():
    from tts_arabic_tpu.infer.pipeline import FastPitch2Wave
    with pytest.raises(ValueError, match="quantize"):
        FastPitch2Wave(quantize="fp4")


def test_pipeline_int8_rejects_vocos():
    from tts_arabic_tpu.infer.pipeline import FastPitch2Wave
    pipe = FastPitch2Wave(seed=0, arabic_in=False, vocoder_type="vocos")
    with pytest.raises(ValueError, match="HiFi-GAN"):
        pipe.calibrate_int8()


def test_tacotron_pipeline_calibrate_int8():
    """Tacotron2Wave.calibrate_int8: default-text calibration decodes
    through the model, tts() switches to int8 and stays PTQ-close."""
    from tts_arabic_tpu.infer.tacotron_pipeline import Tacotron2Wave
    from tts_arabic_tpu.models.tacotron2 import Tacotron2Config
    small = Tacotron2Config(
        n_symbols=40, symbol_embedding_dim=32, encoder_embedding_dim=32,
        num_speakers=1, decoder_rnn_dim=48, attention_rnn_dim=48,
        attention_hidden_dim=16, attention_location_n_filters=4,
        attention_location_kernel_size=7, prenet_dim=16,
        postnet_embedding_dim=32, postnet_n_convolutions=3, n_mels=80,
        decoder_max_step=32)
    t2 = Tacotron2Wave(seed=0, arabic_in=False, config=small)
    t2.model.decoder_max_step = 32
    text = ">atAHat lilbA}iEi lmutajaw~ili"
    ref = t2.tts_single(text, denoise=0.0)
    scales = t2.calibrate_int8()
    assert len(scales) == 54 and t2._int8_scales is scales
    q = t2.tts_single(text, denoise=0.0)
    assert q.shape == ref.shape
    assert _snr_db(ref, q) > 20


def test_scales_accumulate_across_batches():
    """Calibration over several mel batches takes the elementwise max."""
    rng = np.random.default_rng(4)
    mel_a, mel_b = _mel(rng), _mel(rng) * 2.0
    variables = Generator(CFG).init(jax.random.PRNGKey(0), mel_a)
    s_a = collect_mrf_scales(variables, mel_a, CFG, min_ch=64)
    s_ab = collect_mrf_scales(variables, [mel_a, mel_b], CFG, min_ch=64)
    assert all(s_ab[k] >= s_a[k] - 1e-12 for k in s_a)
    assert any(s_ab[k] > s_a[k] for k in s_a)
