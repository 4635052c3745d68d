"""HiFi-GAN vocoder adversarial training: the one capability the reference
carries but never exercises (MPD/MSD + GAN losses with no trainer,
`vocoder/hifigan/models.py:139-293`, SURVEY.md §2.6). Gates: the jitted
D->G step trains (mel term falls on an overfit batch, both nets update),
the segment dataset reproduces upstream crop semantics, and the CLI runs
end-to-end on a synthetic corpus with validation + checkpointing."""
import pathlib
import wave as wave_mod

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_arabic_tpu.train.steps import TrainState
from tts_arabic_tpu.train.vocoder import (init_vocoder_state,
                                          make_hifigan_eval_step,
                                          make_hifigan_train_step)
from tts_arabic_tpu.vocoder.discriminators import (MultiPeriodDiscriminator,
                                                   MultiScaleDiscriminator)
from tts_arabic_tpu.vocoder.hifigan import Generator, HiFiGANConfig

SEG = 2048


def _tiny_modules():
    gen = Generator(HiFiGANConfig(upsample_initial_channel=32))
    mpd = MultiPeriodDiscriminator(periods=(2, 3), width=0.25)
    msd = MultiScaleDiscriminator(n_scales=2, width=0.25)
    return gen, mpd, msd


def _wave_batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(SEG) / 22050.0
    f0 = 110.0 * (1 + np.arange(B))[:, None]
    sig = 0.4 * np.sin(2 * np.pi * f0 * t) \
        + 0.05 * rng.standard_normal((B, SEG))
    return {"wave": jnp.asarray(sig, jnp.float32)}


def test_hifigan_step_trains():
    import optax

    gen, mpd, msd = _tiny_modules()
    tx_g = optax.adamw(1e-3, b1=0.8, b2=0.99)
    tx_d = optax.adamw(1e-3, b1=0.8, b2=0.99)
    state = init_vocoder_state(gen, mpd, msd, tx_g, tx_d, SEG)
    step = jax.jit(make_hifigan_train_step(gen, mpd, msd, tx_g, tx_d))
    batch = _wave_batch()

    g0 = jax.device_get(state.params)
    d0 = jax.device_get(state.d_params)
    mels = []
    for _ in range(12):
        state, meta = step(state, batch, jax.random.PRNGKey(0))
        mels.append(float(meta["mel_loss"]))
        for k in ("loss", "loss_d", "gen_adv_loss", "feat_loss"):
            assert np.isfinite(float(meta[k])), (k, meta)

    # the 45x mel term dominates: overfitting one batch must reduce it
    assert mels[-1] < mels[0], mels
    # both networks actually moved
    g1 = jax.device_get(state.params)
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree.leaves(g0), jax.tree.leaves(g1)))
    d1 = jax.device_get(state.d_params)
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree.leaves(d0), jax.tree.leaves(d1)))
    assert int(state.step) == 12

    # eval step: scalar mel L1, no figures payload
    meta, artifacts = make_hifigan_eval_step(gen)(state, batch, None)
    assert artifacts is None and np.isfinite(float(meta["loss"]))


def test_width_scaling_preserves_default_shapes():
    """width=1.0 must reproduce the reference channel inventory (the knob
    exists for tests/small fine-tunes only)."""
    wave = jnp.zeros((1, 512), jnp.float32)
    full = MultiPeriodDiscriminator(periods=(2,)).init(
        jax.random.PRNGKey(0), wave, wave)["params"]
    assert full["period_2"]["conv_3"]["kernel"].shape[-1] == 1024
    quarter = MultiPeriodDiscriminator(periods=(2,), width=0.25).init(
        jax.random.PRNGKey(0), wave, wave)["params"]
    assert quarter["period_2"]["conv_3"]["kernel"].shape[-1] == 256
    msd = MultiScaleDiscriminator(n_scales=1).init(
        jax.random.PRNGKey(0), wave, wave)["params"]
    assert msd["scale_0"]["conv_4"]["kernel"].shape[-1] == 1024


def test_hifigan_dp_mesh_step():
    """The vocoder step under the same DP mesh path as the other trainers:
    batch sharded over 8 devices, params replicated, psum'd grads — loss
    matches the single-device step (grad mean == full-batch grad: every
    loss term is a mean over batch elements)."""
    import optax

    from tts_arabic_tpu.parallel import (data_parallel_jit, make_mesh,
                                         replicate, shard_batch)

    gen, mpd, msd = _tiny_modules()
    tx_g = optax.adamw(1e-3, b1=0.8, b2=0.99)
    tx_d = optax.adamw(1e-3, b1=0.8, b2=0.99)
    state = init_vocoder_state(gen, mpd, msd, tx_g, tx_d, SEG)
    step_fn = make_hifigan_train_step(gen, mpd, msd, tx_g, tx_d)
    batch = _wave_batch(B=8)

    ref_state, ref_meta = jax.jit(step_fn)(state, batch,
                                           jax.random.PRNGKey(0))

    mesh = make_mesh()
    dp_step = data_parallel_jit(
        lambda s, b: step_fn(s, b, jax.random.PRNGKey(0)), mesh)
    state2, meta = dp_step(replicate(state, mesh), shard_batch(batch, mesh))
    np.testing.assert_allclose(float(meta["loss"]),
                               float(ref_meta["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(meta["loss_d"]),
                               float(ref_meta["loss_d"]), rtol=1e-5)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_corpus")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    lengths = [11025, 13000, 9000, 1024]  # last one shorter than a segment
    for i, n in enumerate(lengths):
        t = np.arange(n) / 22050.0
        sig = (0.3 * np.sin(2 * np.pi * (120 + 15 * i) * t)
               + 0.05 * rng.standard_normal(n)).astype(np.float32)
        pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2")
        with wave_mod.open(str(wav_dir / f"s{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(22050)
            f.writeframes(pcm.tobytes())
        lines.append(f'"s{i}.wav" "b a m a k a"')
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    (root / "test.txt").write_text(lines[0] + "\n")
    return root, wav_dir


def test_vocoder_segment_dataset(corpus):
    from tts_arabic_tpu.data import VocoderSegmentDataset, collate_vocoder

    root, wav_dir = corpus
    ds = VocoderSegmentDataset(root / "train.txt", wav_dir,
                               segment_length=SEG, batch_size=2, seed=3)
    assert len(ds) == 2  # 4 files / batch 2
    batch = collate_vocoder(ds[0])
    assert batch["wave"].shape == (2, SEG)
    assert batch["wave"].dtype == np.float32

    # a clip shorter than the segment is zero-padded, not dropped
    short_rows = [collate_vocoder(ds[i])["wave"] for i in range(len(ds))]
    assert sum(w.shape[0] for w in short_rows) == 4

    # fresh random crops per visit (same batch index, same files)
    a = collate_vocoder(ds[0])["wave"]
    b = collate_vocoder(ds[0])["wave"]
    assert not np.array_equal(a, b)

    with pytest.raises(ValueError):
        VocoderSegmentDataset(root / "train.txt", wav_dir,
                              segment_length=1000)  # not a hop multiple


def test_train_vocoder_cli(corpus, tmp_path):
    import json

    import yaml

    from tts_arabic_tpu.apps import train_vocoder
    from tts_arabic_tpu.runtime.checkpoint import load_states

    root, wav_dir = corpus
    gen_cfg = {"resblock": "1", "upsample_rates": [8, 8, 2, 2],
               "upsample_kernel_sizes": [16, 16, 4, 4],
               "upsample_initial_channel": 32,
               "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1]],
               "num_mels": 80, "sampling_rate": 22050}
    gen_cfg_path = tmp_path / "gen.json"
    gen_cfg_path.write_text(json.dumps(gen_cfg))

    cfg = {
        "restore_model": "",
        "log_dir": str(tmp_path / "logs"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "train_wavs_path": str(wav_dir),
        "train_labels": str(root / "train.txt"),
        "test_wavs_path": str(wav_dir),
        "test_labels": str(root / "test.txt"),
        "label_pattern": '"(?P<filename>.*)" "(?P<phonemes>.*)"',
        "vocoder_state_path": "",
        "vocoder_config_path": str(gen_cfg_path),
        "segment_length": SEG,
        "batch_size": 2,
        "mpd_periods": [2, 3], "msd_scales": 2, "disc_width": 0.25,
        "g_lr": 2.0e-4, "g_beta1": 0.8, "g_beta2": 0.99,
        "d_lr": 2.0e-4, "d_beta1": 0.8, "d_beta2": 0.99,
        "lr_decay": 0.999,
        "n_save_states_iter": 1, "n_save_backup_iter": 1000,
        "epochs": 1,
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    train_vocoder.main(["--config", str(cfg_path), "--no-mesh"])

    states = load_states(pathlib.Path(cfg["checkpoint_dir"]) / "states.ckpt")
    assert "model" in states and "model_d" in states
    assert {"mpd", "msd"} <= set(states["model_d"].keys())
    assert states["config"]["net_config"]["upsample_initial_channel"] == 32
