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
