"""Bidirectional checkpoint interchange: flax -> reference .pth export.

Two independent gates per model family:
1. round trip — export then re-import reproduces the flax tree exactly
   (the importer is already differentially validated against the
   reference networks, so export == import^-1 proves layout
   correctness);
2. strict load — the exported state dict loads into the ACTUAL reference
   torch module with strict=True (proves key-set completeness, including
   synthesized unused modules like FastPitch's attention.attn_proj)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ref_loader import load_reference
from tts_arabic_tpu.models.fastpitch import FastPitch, FastPitchConfig
from tts_arabic_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tts_arabic_tpu.models.torch_export import (fastpitch_params_to_torch,
                                                hifigan_params_to_torch,
                                                save_reference_checkpoint,
                                                tacotron2_params_to_torch)
from tts_arabic_tpu.models.torch_import import (fastpitch_params_from_torch,
                                                hifigan_params_from_torch,
                                                tacotron2_params_from_torch)
from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig


def _tree_allclose(a, b, atol=0.0):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=0)


def _torchify(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
            sd.items()}


@pytest.fixture(scope="module")
def fp_vars():
    # init through forward_train so the ConvAttention aligner params exist
    # (a trained checkpoint always has them; `infer` init would not)
    config = FastPitchConfig(n_speakers=4)
    model = FastPitch(config)
    B, T_txt, T_mel = 1, 8, 16
    tokens = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), tokens,
        jnp.asarray([T_txt], jnp.int32),
        jnp.zeros((B, T_mel, 80)), jnp.asarray([T_mel], jnp.int32),
        jnp.zeros((B, 1, T_mel)), jnp.zeros((B, T_mel)),
        jnp.full((B, T_mel, T_txt), 1.0 / T_txt),
        jnp.full((B, T_txt), T_mel / T_txt, jnp.float32),
        speaker=jnp.asarray([1], jnp.int32),
        deterministic=True, method=FastPitch.forward_train)
    return config, variables


def test_fastpitch_export_roundtrip(fp_vars):
    config, variables = fp_vars
    sd = fastpitch_params_to_torch(variables, config)
    back = fastpitch_params_from_torch(sd, config)
    _tree_allclose(variables["params"], back["params"])


def test_fastpitch_export_strict_load(fp_vars, reference_dir):
    load_reference(reference_dir)
    from models.fastpitch import net_config
    from models.fastpitch.fastpitch.model import FastPitch as RefFastPitch

    config, variables = fp_vars
    cfg = dict(net_config)
    cfg["n_symbols"] = config.n_symbols
    cfg["n_speakers"] = config.n_speakers
    ref = RefFastPitch(**cfg).eval()
    sd = fastpitch_params_to_torch(variables, config)
    missing, unexpected = ref.load_state_dict(_torchify(sd), strict=False)
    assert not missing, missing
    assert not unexpected, unexpected


def test_fastpitch_export_checkpoint_file(fp_vars, tmp_path):
    """save_reference_checkpoint writes the wrapper-consumable layout
    (networks.py:52-60: {'model', 'config', 'symbols'}) and our own
    torch-checkpoint loader reads it back."""
    from tts_arabic_tpu.runtime.checkpoint import load_torch_state_dict
    from tts_arabic_tpu.text import symbols

    config, variables = fp_vars
    sd = fastpitch_params_to_torch(variables, config)
    path = save_reference_checkpoint(
        tmp_path / "fp.pth", sd, config={"n_symbols": config.n_symbols},
        symbols=symbols)
    flat = load_torch_state_dict(path)
    extras = flat.pop("__extras__")
    assert extras["config"]["n_symbols"] == config.n_symbols
    assert list(extras["symbols"]) == list(symbols)
    back = fastpitch_params_from_torch(flat, config)
    _tree_allclose(variables["params"], back["params"])


# --- HiFi-GAN ---------------------------------------------------------------

@pytest.fixture(scope="module")
def gen_vars():
    config = HiFiGANConfig(upsample_initial_channel=32)
    gen = Generator(config)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 80)) - 5.0
    return config, gen.init(jax.random.PRNGKey(0), mel)


@pytest.mark.parametrize("layout", ["legacy", "parametrizations"])
def test_hifigan_export_roundtrip(gen_vars, layout):
    config, variables = gen_vars
    sd = hifigan_params_to_torch(variables, config, layout=layout)
    back = hifigan_params_from_torch(sd, config)
    _tree_allclose(variables["params"], back["params"], atol=1e-6)


def test_hifigan_export_strict_load(gen_vars, reference_dir):
    load_reference(reference_dir)
    from vocoder.hifigan.models import Generator as RefGenerator

    config, variables = gen_vars

    class H:  # reference AttrDict-alike
        resblock = config.resblock
        upsample_rates = list(config.upsample_rates)
        upsample_kernel_sizes = list(config.upsample_kernel_sizes)
        upsample_initial_channel = config.upsample_initial_channel
        resblock_kernel_sizes = list(config.resblock_kernel_sizes)
        resblock_dilation_sizes = [list(d) for d in
                                   config.resblock_dilation_sizes]

    ref = RefGenerator(H()).eval()
    ref_layout = ("parametrizations"
                  if any("parametrizations" in k for k in ref.state_dict())
                  else "legacy")
    sd = hifigan_params_to_torch(variables, config, layout=ref_layout)
    missing, unexpected = ref.load_state_dict(_torchify(sd), strict=False)
    assert not missing, missing
    assert not unexpected, unexpected

    # and the loaded torch generator produces our waveform: fold the norm
    # and compare one forward pass
    ref.remove_weight_norm()
    mel = np.random.default_rng(0).standard_normal((1, 80, 24)).astype(
        np.float32) - 5.0
    with torch.no_grad():
        wave_ref = ref(torch.from_numpy(mel))[0].numpy()
    wave_ours = np.asarray(Generator(config).apply(
        variables, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(wave_ref.reshape(-1), wave_ours.reshape(-1),
                               atol=2e-5)


# --- Tacotron2 --------------------------------------------------------------

def test_tacotron2_export_roundtrip():
    config = Tacotron2Config(num_speakers=4)
    model = Tacotron2(config)
    tokens = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    lens = jnp.asarray([8], jnp.int32)
    mel = jnp.zeros((1, 12, config.n_mels))
    variables = model.init(
        jax.random.PRNGKey(0), tokens, lens, mel,
        jnp.asarray([12], jnp.int32),
        speaker_ids=jnp.asarray([0], jnp.int32))
    sd = tacotron2_params_to_torch(variables, config)
    back = tacotron2_params_from_torch(sd, config)
    _tree_allclose(variables["params"], back["params"])
    _tree_allclose(variables["batch_stats"], back["batch_stats"])
    # torchaudio BN state dicts carry the counter; strict load needs it
    assert "encoder.convolutions.0.1.num_batches_tracked" in sd


# --- CLI --------------------------------------------------------------------

def test_export_torch_cli_hifigan(gen_vars, tmp_path):
    """states.ckpt (training format) -> reference {'generator': ...} .pth;
    our own .pth loader + importer reproduce the tree."""
    import dataclasses

    from tts_arabic_tpu.apps import export_torch
    from tts_arabic_tpu.runtime.checkpoint import (load_torch_state_dict,
                                                   save_states)

    config, variables = gen_vars
    ckpt = tmp_path / "states.ckpt"
    save_states(ckpt, step=3, epoch=1,
                config={"net_config": dataclasses.asdict(config)},
                model=variables["params"])
    out = tmp_path / "hifigan_ft.pth"
    export_torch.main(["--model", "hifigan", "--checkpoint", str(ckpt),
                       "--out", str(out)])
    flat = load_torch_state_dict(out)  # unwraps the 'generator' key
    flat.pop("__extras__", None)
    back = hifigan_params_from_torch(flat, config)
    _tree_allclose(variables["params"], back["params"], atol=1e-6)


def test_export_torch_cli_fastpitch(fp_vars, tmp_path):
    """FastPitch CLI export embeds config+symbols the reference wrapper
    reads (networks.py:52-60) and round-trips through our importer."""
    import dataclasses

    from tts_arabic_tpu.apps import export_torch
    from tts_arabic_tpu.models.fastpitch import FastPitchConfig
    from tts_arabic_tpu.runtime.checkpoint import (load_torch_state_dict,
                                                   save_states)
    from tts_arabic_tpu.text import symbols

    config, variables = fp_vars
    ckpt = tmp_path / "states.ckpt"
    save_states(ckpt, step=5, epoch=2,
                config={"net_config": dataclasses.asdict(config)},
                model=variables["params"])
    out = tmp_path / "fp_ft.pth"
    export_torch.main(["--model", "fastpitch", "--checkpoint", str(ckpt),
                       "--out", str(out)])
    flat = load_torch_state_dict(out)
    extras = flat.pop("__extras__")
    assert list(extras["symbols"]) == list(symbols)
    # embedded config is reference-layout; it maps back onto ours
    cfg2 = FastPitchConfig.from_reference_net_config(extras["config"])
    assert cfg2 == config
    back = fastpitch_params_from_torch(flat, config)
    _tree_allclose(variables["params"], back["params"], atol=1e-6)


def test_tacotron2_export_strict_load_oracle():
    """Key-set completeness vs the state-dict-compatible torchaudio-layout
    oracle (tests/t2_oracle.py; torchaudio itself is absent here). Uses
    the oracle's tiny dims to keep it fast."""
    from t2_oracle import Tacotron2Oracle

    kw = dict(n_symbols=40, num_speakers=4, speaker_embedding_dim=8,
              symbol_embedding_dim=16, encoder_embedding_dim=16,
              encoder_n_convolutions=2, encoder_kernel_size=3,
              decoder_rnn_dim=24, attention_rnn_dim=24,
              attention_hidden_dim=12, attention_location_n_filters=4,
              attention_location_kernel_size=7, prenet_dim=8,
              postnet_n_convolutions=2, postnet_kernel_size=3,
              postnet_embedding_dim=12, n_mels=80)
    config = Tacotron2Config(**kw)
    model = Tacotron2(config)
    tokens = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), tokens, jnp.asarray([8], jnp.int32),
        jnp.zeros((1, 12, 80)), jnp.asarray([12], jnp.int32),
        speaker_ids=jnp.asarray([0], jnp.int32))
    sd = tacotron2_params_to_torch(variables, config)

    ref_kw = {("n_symbol" if k == "n_symbols" else
               "encoder_n_convolution" if k == "encoder_n_convolutions" else
               "attention_location_n_filter"
               if k == "attention_location_n_filters" else
               "postnet_n_convolution" if k == "postnet_n_convolutions"
               else k): v for k, v in kw.items()}
    oracle = Tacotron2Oracle(**ref_kw)
    missing, unexpected = oracle.load_state_dict(_torchify(sd), strict=False)
    assert not missing, missing
    assert not unexpected, unexpected
