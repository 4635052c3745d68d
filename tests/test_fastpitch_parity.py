"""Differential parity tests: reference torch FastPitch / HiFi-GAN with
random weights vs our flax implementation loaded through the torch importer.

This is the strongest available parity gate (SURVEY.md §4 item 2): no
pretrained checkpoints ship with the reference, so we check that for random
networks the imported parameters produce matching activations end-to-end.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ref_loader import load_reference
from tts_arabic_tpu.models.fastpitch import (FastPitch, FastPitchConfig,
                                             average_by_durations,
                                             regulate_len)
from tts_arabic_tpu.models.torch_import import (fastpitch_params_from_torch,
                                                hifigan_params_from_torch)
from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def ref(reference_dir):
    load_reference(reference_dir)
    from models.fastpitch.fastpitch.model import FastPitch as RefFastPitch
    from models.fastpitch import net_config
    cfg = dict(net_config)
    cfg["n_symbols"] = 40
    torch.manual_seed(0)
    model = RefFastPitch(**cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def ours(ref):
    model, cfg = ref
    config = FastPitchConfig.from_reference_net_config(cfg)
    variables = fastpitch_params_from_torch(_np_sd(model), config)
    return FastPitch(config), variables


def test_config_mapping(ref):
    _, cfg = ref
    config = FastPitchConfig.from_reference_net_config(cfg)
    assert config.d_model == 384 and config.enc_n_layers == 6
    assert config.enc_filter_size == 1536 and config.n_symbols == 40
    assert config.energy_conditioning


def test_infer_parity(ref, ours):
    """Full infer path: tokens -> mel must match the torch reference.

    Oracle = the reference run at EXACT length per sample (its
    `ttmel_single` semantics, networks.py:95-138). Our stack is
    pad-invariant by construction (see layers.ConvFFN): a padded batch row
    must reproduce the exact-length reference result bit-close, whereas the
    reference's own padded batches leak pad values through its double-convs
    and depend on batch composition."""
    model, _ = ref
    fp, variables = ours

    rng = np.random.default_rng(0)
    B, T = 2, 17
    tokens = rng.integers(1, 40, size=(B, T))
    real_lens = [T, 12]
    tokens[1, real_lens[1]:] = 0  # padding

    refs = []
    for b in range(B):
        tokens_t = torch.from_numpy(tokens[b:b + 1, : real_lens[b]]).long()
        with torch.no_grad():
            mel_b, dec_b, dur_b, pitch_b, _ = model.infer(tokens_t)
        refs.append((mel_b[0].numpy(), int(dec_b[0]), dur_b[0].numpy(),
                     pitch_b[0].numpy()))

    max_frames = max(r[1] for r in refs)
    out = FastPitch(fp.config).apply(
        variables, jnp.asarray(tokens), max_frames=max_frames,
        method=FastPitch.infer)
    mel = np.asarray(out["mel"]).transpose(0, 2, 1)
    mel_lens = np.asarray(out["mel_lens"])

    for b, (mel_ref, dec_len_ref, dur_ref, pitch_ref) in enumerate(refs):
        L_txt = real_lens[b]
        assert mel_lens[b] == dec_len_ref
        np.testing.assert_allclose(np.asarray(out["dur_pred"])[b, :L_txt],
                                   dur_ref, rtol=1e-3, atol=1e-4)
        # padded token positions must predict exactly zero duration
        np.testing.assert_array_equal(
            np.asarray(out["dur_pred"])[b, L_txt:], 0.0)
        np.testing.assert_allclose(np.asarray(out["pitch_pred"])[b, :, :L_txt],
                                   pitch_ref, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(mel[b, :, :dec_len_ref],
                                   mel_ref[:, :dec_len_ref],
                                   rtol=1e-3, atol=2e-3)


def test_infer_pad_invariance(ours):
    """The same sentence must synthesize identically regardless of how much
    bucket padding surrounds it (batch composition independence)."""
    fp, variables = ours
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 40, size=14)

    def run(T_pad, max_frames):
        tokens = np.zeros((1, T_pad), np.int64)
        tokens[0, : len(ids)] = ids
        out = FastPitch(fp.config).apply(
            variables, jnp.asarray(tokens), max_frames=max_frames,
            method=FastPitch.infer)
        L = int(np.asarray(out["mel_lens"])[0])
        return np.asarray(out["mel"])[0, :L], L

    mel_a, L_a = run(14, 512)
    mel_b, L_b = run(32, 768)
    assert L_a == L_b
    np.testing.assert_allclose(mel_a, mel_b, rtol=1e-5, atol=1e-5)


def test_regulate_len_matches_reference(ref):
    load_reference()
    from models.fastpitch.fastpitch.model import regulate_len as ref_regulate
    rng = np.random.default_rng(1)
    durs = rng.integers(0, 9, size=(3, 11)).astype(np.float32)
    enc = rng.standard_normal((3, 11, 6)).astype(np.float32)
    out_ref, lens_ref = ref_regulate(torch.from_numpy(durs),
                                     torch.from_numpy(enc), pace=1.0)
    max_frames = int(lens_ref.max())
    out, lens = regulate_len(jnp.asarray(durs), jnp.asarray(enc), max_frames)
    np.testing.assert_array_equal(np.asarray(lens), lens_ref.numpy())
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=1e-5)


def test_average_by_durations_matches_reference(ref):
    load_reference()
    from models.fastpitch.fastpitch.model import average_pitch as ref_avg
    rng = np.random.default_rng(2)
    B, T_txt = 3, 9
    durs = rng.integers(0, 5, size=(B, T_txt)).astype(np.float32)
    T_mel = int(durs.sum(1).max()) + 2
    pitch = rng.standard_normal((B, 1, T_mel)).astype(np.float32)
    pitch[pitch < 0] = 0.0  # exercise the nonzero-count path
    out_ref = ref_avg(torch.from_numpy(pitch), torch.from_numpy(durs))
    out = average_by_durations(jnp.asarray(pitch), jnp.asarray(durs))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=1e-5)


# --- HiFi-GAN ---------------------------------------------------------------

class _AttrDict(dict):
    __getattr__ = dict.__getitem__


@pytest.fixture(scope="module")
def ref_hifigan(reference_dir):
    load_reference(reference_dir)
    from vocoder.hifigan.models import Generator as RefGenerator
    import json
    with open(reference_dir / "pretrained/hifigan-asc-v1/config.json") as f:
        h = _AttrDict(json.load(f))
    torch.manual_seed(1)
    gen = RefGenerator(h)
    gen.remove_weight_norm()
    gen.eval()
    return gen, h


def test_hifigan_parity(ref_hifigan, reference_dir):
    gen, h = ref_hifigan
    config = HiFiGANConfig.from_json(
        reference_dir / "pretrained/hifigan-asc-v1/config.json")
    variables = hifigan_params_from_torch(_np_sd(gen), config)

    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, 80, 37)).astype(np.float32) * 2 - 4
    with torch.no_grad():
        wav_ref = gen(torch.from_numpy(mel)).numpy()[:, 0, :]

    wav = Generator(config).apply(variables,
                                  jnp.asarray(mel.transpose(0, 2, 1)))
    assert wav.shape == wav_ref.shape == (2, 37 * 256)
    np.testing.assert_allclose(np.asarray(wav), wav_ref, rtol=1e-3, atol=1e-4)


def test_hifigan_upsample_factor():
    config = HiFiGANConfig()
    assert config.hop_length == 256


def test_infer_parity_multispeaker(reference_dir):
    """Speaker-conditioned infer (the reference ships a multispeaker
    checkpoint, `fastpitch_ar_ms.pth`): random-weight reference FastPitch
    with n_speakers>1 vs ours through the importer, exact-length oracle.
    Different speaker ids must produce different (and matching) mels."""
    load_reference(reference_dir)
    from models.fastpitch.fastpitch.model import FastPitch as RefFastPitch
    from models.fastpitch import net_config

    cfg = dict(net_config)
    cfg.update(n_symbols=40, n_speakers=5)
    torch.manual_seed(1)
    model = RefFastPitch(**cfg).eval()
    config = FastPitchConfig.from_reference_net_config(cfg)
    assert config.n_speakers == 5
    variables = fastpitch_params_from_torch(_np_sd(model), config)

    rng = np.random.default_rng(5)
    tokens = rng.integers(1, 40, size=(1, 13))
    mels = {}
    for sid in (0, 3):
        with torch.no_grad():
            mel_ref, dec_ref, *_ = model.infer(
                torch.from_numpy(tokens).long(), speaker=sid)
        out = FastPitch(config).apply(
            variables, jnp.asarray(tokens), speaker=sid,
            max_frames=int(mel_ref.shape[2]), method=FastPitch.infer)
        L = int(dec_ref[0])
        assert int(np.asarray(out["mel_lens"])[0]) == L
        mel_ours = np.asarray(out["mel"])[0, :L].T
        np.testing.assert_allclose(mel_ours, mel_ref[0].numpy()[:, :L],
                                   rtol=1e-3, atol=2e-3)
        mels[sid] = mel_ours
    # speaker conditioning actually does something
    assert (mels[0].shape != mels[3].shape
            or np.abs(mels[0] - mels[3]).max() > 1e-3)


def test_pitch_transform_hook_matches_reference(ref, ours):
    """General `pitch_transform` callable (model.py:373-380), with the
    LJSpeech mean/std fallback when the checkpoint stores no stats."""
    model, _ = ref
    fp, variables = ours

    rng = np.random.default_rng(7)
    tokens = rng.integers(1, 40, size=(1, 11))

    def trf_torch(pitch, lens, mean, std):
        return pitch * 1.2 + 0.5 * (float(mean) > 0)

    def trf_jax(pitch, lens, mean, std):
        return pitch * 1.2 + 0.5 * (mean > 0)

    with torch.no_grad():
        mel_ref, dec_ref, _, pitch_ref, _ = model.infer(
            torch.from_numpy(tokens).long(), pitch_transform=trf_torch)
    out = FastPitch(fp.config).apply(
        variables, jnp.asarray(tokens), max_frames=int(mel_ref.shape[2]),
        pitch_transform=trf_jax, method=FastPitch.infer)
    assert int(np.asarray(out["mel_lens"])[0]) == int(dec_ref[0])
    np.testing.assert_allclose(np.asarray(out["pitch_pred"])[0],
                               pitch_ref[0].numpy(), rtol=1e-3, atol=1e-4)
    L = int(dec_ref[0])
    np.testing.assert_allclose(np.asarray(out["mel"])[0, :L].T,
                               mel_ref[0].numpy()[:, :L],
                               rtol=1e-3, atol=2e-3)
