"""Eval tests: native C++ DTW vs reference numba kernel (run as python),
oversmoothing metric parity, MCD sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ref_loader import load_reference
from tts_arabic_tpu.eval import (compute_mel_oversmoothing_metrics,
                                 dtw_align_mels, dtw_path, mcd,
                                 oversmoothing_metrics_aligned,
                                 using_native_kernel)


def test_native_kernel_builds():
    assert using_native_kernel(), "C++ DTW library failed to build/load"


@pytest.fixture(scope="module")
def ref_dtw(reference_dir):
    load_reference(reference_dir)
    from utils.oversmoothing import _dtw_path_numba
    return _dtw_path_numba


@pytest.mark.parametrize("metric,window", [("l2", -1), ("cosine", -1),
                                           ("l2", 8)])
def test_dtw_matches_reference(ref_dtw, metric, window):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((40, 12)).astype(np.float32)
    B = rng.standard_normal((55, 12)).astype(np.float32)
    mcode = 0 if metric == "l2" else 1
    cost_ref, path_ref = ref_dtw(A, B, metric=mcode, window=window)
    cost, path = dtw_path(A, B, metric=metric,
                          window=None if window < 0 else window)
    np.testing.assert_allclose(cost, cost_ref, rtol=1e-4)
    np.testing.assert_array_equal(path, path_ref)


def test_dtw_numpy_fallback_matches_native():
    from tts_arabic_tpu.eval.dtw import _dtw_numpy, _dtw_native
    rng = np.random.default_rng(1)
    A = rng.standard_normal((30, 8)).astype(np.float32)
    B = rng.standard_normal((25, 8)).astype(np.float32)
    for m in (0, 1):
        cn, pn = _dtw_native(A, B, m, -1)
        cf, pf = _dtw_numpy(A, B, m, -1)
        np.testing.assert_allclose(cn, cf, rtol=1e-4)
        np.testing.assert_array_equal(pn, pf)


def test_dtw_align_identity():
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((80, 60)).astype(np.float32)
    cost, path, A_al, B_al = dtw_align_mels(mel, mel)
    assert cost < 1e-3
    np.testing.assert_array_equal(path[:, 0], path[:, 1])
    np.testing.assert_allclose(A_al, B_al)


def test_oversmoothing_matches_reference(reference_dir):
    load_reference(reference_dir)
    from utils.oversmoothing import (
        compute_mel_oversmoothing_metrics as ref_metrics)
    rng = np.random.default_rng(3)
    mel = rng.normal(0, 1, (80, 120)).astype(np.float32)
    ours = compute_mel_oversmoothing_metrics(mel, reduction="median")
    theirs = ref_metrics(mel, reduction="median")
    for k in ("HQER", "CSlope", "CCentroid", "CRoll95", "Q"):
        np.testing.assert_allclose(ours[k], theirs[k], rtol=1e-4,
                                   err_msg=k)


def test_aligned_metrics_match_reference(reference_dir):
    load_reference(reference_dir)
    from utils.oversmoothing import (
        oversmoothing_metrics_aligned as ref_aligned)
    rng = np.random.default_rng(4)
    mel_a = rng.normal(0, 1, (80, 100)).astype(np.float32)
    idx = np.round(np.linspace(0, 99, 85)).astype(int)
    mel_b = mel_a[:, idx] + 0.05 * rng.normal(0, 1, (80, 85)).astype(
        np.float32)
    ours = oversmoothing_metrics_aligned(mel_a, mel_b)
    theirs = ref_aligned(mel_a, mel_b)
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=1e-3, atol=1e-5,
                                   err_msg=k)


def test_mcd_properties():
    rng = np.random.default_rng(5)
    mel = rng.normal(-4, 2, (80, 90)).astype(np.float32)
    assert mcd(mel, mel) < 1e-5
    noisy = mel + 0.5 * rng.normal(0, 1, mel.shape).astype(np.float32)
    d1 = mcd(mel, noisy)
    d2 = mcd(mel, mel + 2 * (noisy - mel))
    assert 0 < d1 < d2
    # different lengths align via DTW
    assert np.isfinite(mcd(mel, mel[:, :70]))


# --- analytic FLOPs accounting vs XLA's own cost model ----------------------

def _xla_flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    return compiled.cost_analysis()["flops"]


def test_fastpitch_flops_match_xla():
    """Analytic encode/decode FLOPs within 20% of XLA compiled cost."""
    from tts_arabic_tpu.eval import flops as F
    from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig

    cfg = FastPitchConfig()
    model = FastPitch(cfg)
    B, T, frames = 2, 48, 256
    tokens = jnp.ones((B, T), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens, max_frames=16)

    enc = jax.jit(lambda v, t: model.apply(
        v, t, method=FastPitch.encode_infer))
    got = _xla_flops(enc, variables, tokens)
    want = B * F.fastpitch_encode_flops(cfg, T)
    assert abs(got - want) / got < 0.20, (got, want)

    enc_out = model.apply(variables, tokens, method=FastPitch.encode_infer)
    dec = jax.jit(lambda v, e, d: model.apply(
        v, e, d, frames, method=FastPitch.decode))
    got = _xla_flops(dec, variables, enc_out["enc_out"], enc_out["dur_pred"])
    want = B * F.fastpitch_decode_flops(cfg, T, frames)
    assert abs(got - want) / got < 0.20, (got, want)


def test_hifigan_flops_match_xla():
    from tts_arabic_tpu.eval import flops as F
    from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig()
    gen = Generator(cfg)
    mel = jnp.zeros((1, 48, cfg.num_mels))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    got = _xla_flops(gen.apply, variables, mel)
    want = F.hifigan_flops(48, cfg)
    assert abs(got - want) / got < 0.15, (got, want)


def test_vocos_flops_match_xla():
    from tts_arabic_tpu.eval import flops as F
    from tts_arabic_tpu.vocoder.vocos import CONFIG_22K, MelVocosModule

    cfg = {k: v for k, v in CONFIG_22K.items() if k != "sample_rate"}
    voc = MelVocosModule(**cfg)
    mel = jnp.zeros((1, 32, cfg["n_mels"]))
    variables = jax.jit(voc.init)(jax.random.PRNGKey(0), mel)
    bias = jax.jit(
        lambda v: voc.apply(v, method=MelVocosModule.bias_vector))(variables)
    got = _xla_flops(lambda v, m: voc.apply(v, m, bias, 0.0), variables, mel)
    want = F.vocos_flops(32, n_mels=cfg["n_mels"])
    # ISTFT/window terms are estimated; allow 30%
    assert abs(got - want) / got < 0.30, (got, want)


def test_chip_peak_flops_table():
    from tts_arabic_tpu.eval.flops import chip_peak_flops

    class FakeDev:
        device_kind = "TPU v5 lite"

    assert chip_peak_flops(FakeDev()) == 197e12

    class Unknown:
        device_kind = "Quantum9000"

    assert chip_peak_flops(Unknown()) is None


# --- attention-alignment diagnostics (eval/alignment.py) --------------------

def _diag_attn(B=2, T_mel=120, T_txt=32, jitter=0.0, seed=0):
    """Soft attention concentrated on the ideal diagonal (+-jitter tokens)."""
    rng = np.random.default_rng(seed)
    attn = np.zeros((B, T_mel, T_txt), np.float32)
    for b in range(B):
        for t in range(T_mel):
            j = int((t + 0.5) * T_txt / T_mel)
            if jitter:
                j += rng.integers(-jitter, jitter + 1)
            j = np.clip(j, 0, T_txt - 1)
            attn[b, t, j] = 1.0
    return attn


def test_alignment_diagnostics_diagonal_vs_uniform_vs_collapsed():
    from tts_arabic_tpu.eval import alignment_diagnostics

    B, T_mel, T_txt = 2, 120, 32
    lens = np.full(B, T_mel, np.int32), np.full(B, T_txt, np.int32)

    d = {k: float(v) for k, v in alignment_diagnostics(
        _diag_attn(), *lens).items()}
    assert d["attn_diag_mass"] > 0.95
    assert d["attn_peak_drift"] < 0.1
    assert d["attn_coverage"] > 0.95

    uniform = np.full((B, T_mel, T_txt), 1.0 / T_txt, np.float32)
    u = {k: float(v) for k, v in alignment_diagnostics(
        uniform, *lens).items()}
    assert u["attn_diag_mass"] < 0.45  # ~2*band/T_txt
    assert u["attn_coverage"] < 0.1    # argmax frozen on token 0

    collapsed = np.zeros((B, T_mel, T_txt), np.float32)
    collapsed[:, :, 5] = 1.0
    c = {k: float(v) for k, v in alignment_diagnostics(
        collapsed, *lens).items()}
    # token 5 stays inside the diagonal band for the first ~30% of frames;
    # coverage is the collapse detector
    assert c["attn_diag_mass"] < 0.35
    assert c["attn_coverage"] < 0.1

    # wandering attention: diagonal peaks shuffled in time -> huge drift
    wander = _diag_attn()[:, np.random.default_rng(0).permutation(T_mel)]
    w = {k: float(v) for k, v in alignment_diagnostics(
        wander, *lens).items()}
    assert w["attn_peak_drift"] > 2.0


def test_alignment_diagnostics_masks_padding():
    """Padded frames/tokens must not affect the scores: a clean diagonal
    over the valid region scores the same with or without garbage padding."""
    from tts_arabic_tpu.eval import alignment_diagnostics

    attn = _diag_attn(B=1, T_mel=80, T_txt=20)
    mel_lens = np.asarray([80], np.int32)
    tok_lens = np.asarray([20], np.int32)
    clean = {k: float(v) for k, v in alignment_diagnostics(
        attn, mel_lens, tok_lens).items()}

    padded = np.zeros((1, 120, 32), np.float32)
    padded[:, :80, :20] = attn
    padded[:, 80:, :] = 1.0 / 32   # garbage beyond mel_len
    padded[:, :80, 20:] = 0.7      # garbage beyond token_len
    pad = {k: float(v) for k, v in alignment_diagnostics(
        padded, mel_lens, tok_lens).items()}
    for k in clean:
        np.testing.assert_allclose(pad[k], clean[k], atol=1e-6, err_msg=k)
