"""Vocos tests: backbone/head parity vs the reference torch implementation,
MDCT/IMDCT round trip, MelVocos wrapper."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ref_loader import load_reference
from tts_arabic_tpu.models.torch_import import vocos_params_from_torch
from tts_arabic_tpu.vocoder.vocos import (MelVocos, MelVocosModule, imdct,
                                          mdct, symexp, symlog)


def _np_sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_melvocos_parity(reference_dir):
    load_reference(reference_dir)
    from vocoder.vocos.pretrained import MelVocos as RefMelVocos
    torch.manual_seed(0)
    ref = RefMelVocos(config_name="22k").eval()
    sd = _np_sd(ref)
    variables = vocos_params_from_torch(sd, num_layers=8)

    module = MelVocosModule()  # 22k defaults
    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((2, 80, 53)) * 2 - 4).astype(np.float32)

    with torch.no_grad():
        wave_ref = ref(torch.from_numpy(mel), denoise=0.1).numpy()

    bias = module.apply(variables, method=MelVocosModule.bias_vector)
    wave = np.asarray(module.apply(
        variables, jnp.asarray(mel.transpose(0, 2, 1)), bias, 0.1))
    assert wave.shape == wave_ref.shape
    np.testing.assert_allclose(wave, wave_ref, rtol=1e-3, atol=2e-4)

    # denoising bias vector itself matches
    np.testing.assert_allclose(np.asarray(bias),
                               ref.bias_vec[0].numpy(), rtol=1e-3, atol=1e-5)


def test_melvocos_wrapper_random():
    mv = MelVocos(config_name="22k", seed=0)
    mel = np.random.default_rng(1).standard_normal((80, 40)).astype(
        np.float32)
    wave = mv(mel, denoise=0.005)
    assert wave.shape == (1, 40 * 256)
    assert np.isfinite(wave).all()


def test_mdct_imdct_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 2048)).astype(np.float32) * 0.3
    for padding in ("same", "center"):
        X = mdct(jnp.asarray(x), 512, padding)
        y = np.asarray(imdct(X, 512, padding))
        assert y.shape[-1] >= 2048 - 512
        n = min(y.shape[-1], 2048)
        # interior reconstructs (TDAC); edges lose the first/last half frame
        np.testing.assert_allclose(y[:, 300: n - 300], x[:, 300: n - 300],
                                   atol=1e-3)


def test_symlog_symexp_inverse():
    x = jnp.asarray([-5.0, -0.5, 0.0, 0.5, 5.0])
    np.testing.assert_allclose(np.asarray(symexp(symlog(x))),
                               np.asarray(x), rtol=1e-5)


def test_imdct_heads_shapes():
    from tts_arabic_tpu.vocoder.vocos import IMDCTCosHead, IMDCTSymExpHead
    x = jnp.zeros((2, 12, 64))
    for head_cls in (IMDCTSymExpHead, IMDCTCosHead):
        head = head_cls(dim=64, mdct_frame_len=128)
        v = head.init(jax.random.PRNGKey(0), x)
        audio = head.apply(v, x)
        assert audio.shape[0] == 2 and audio.ndim == 2


def test_resnet_backbone_shape():
    from tts_arabic_tpu.vocoder.vocos import VocosResNetBackbone
    bb = VocosResNetBackbone(input_channels=80, dim=64, num_blocks=2)
    x = jnp.zeros((2, 17, 80))
    v = bb.init(jax.random.PRNGKey(0), x)
    y = bb.apply(v, x)
    assert y.shape == (2, 17, 64)


def test_generic_vocos_from_hparams(tmp_path, reference_dir):
    """Generic `Vocos.from_hparams` decode parity vs the reference
    (pretrained.py:100-181) with shared random weights through the
    importer."""
    import torch
    import yaml
    from ref_loader import load_reference
    load_reference(reference_dir)
    from vocoder.vocos.pretrained import Vocos as RefVocos
    from tts_arabic_tpu.vocoder.vocos import Vocos

    cfg = {
        "feature_extractor": {
            "class_path": "vocoder.vocos.feature_extractors.MelSpectrogramFeatures",
            "init_args": {"sample_rate": 24000, "n_fft": 1024,
                          "hop_length": 256, "n_mels": 100,
                          "padding": "center"}},
        "backbone": {
            "class_path": "vocoder.vocos.models.VocosBackbone",
            "init_args": {"input_channels": 100, "dim": 64,
                          "intermediate_dim": 96, "num_layers": 2}},
        "head": {
            "class_path": "vocoder.vocos.heads.ISTFTHead",
            "init_args": {"dim": 64, "n_fft": 1024, "hop_length": 256,
                          "padding": "center"}},
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    torch.manual_seed(0)
    ref = RefVocos.from_hparams(str(cfg_path)).eval()
    sd_path = tmp_path / "model.pth"
    torch.save(ref.state_dict(), str(sd_path))

    ours = Vocos.from_hparams(str(cfg_path), str(sd_path))

    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((2, 100, 23)) * 1.5 - 4).astype(np.float32)
    with torch.no_grad():
        wave_ref = ref.decode(torch.from_numpy(feats)).numpy()
    wave = ours.decode(feats)
    assert wave.shape == wave_ref.shape
    np.testing.assert_allclose(wave, wave_ref, rtol=1e-3, atol=1e-4)


def test_htk_filterbank_matches_formula():
    """htk=True filterbank against an independent scalar implementation of
    the torchaudio/HTK mel scale."""
    from tts_arabic_tpu.audio.mel import slaney_mel_filterbank

    sr, n_fft, n_mels = 24000, 512, 20
    fb = slaney_mel_filterbank(sr, n_fft, n_mels, norm=None, htk=True)
    # independent: triangular weights from scalar htk formulas
    def h2m(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def m2h(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    pts = m2h(np.linspace(h2m(0.0), h2m(sr / 2), n_mels + 2))
    expected = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(freqs):
            if lo <= f <= c and c > lo:
                expected[m, k] = (f - lo) / (c - lo)
            elif c < f <= hi and hi > c:
                expected[m, k] = (hi - f) / (hi - c)
    np.testing.assert_allclose(fb, expected, atol=1e-5)
