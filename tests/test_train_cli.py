"""End-to-end train CLI tests on a synthetic mini-corpus: one epoch of each
recipe must run through data loading, the jitted step, per-epoch validation
(val/ scalars + figures), and checkpointing."""
import json
import pathlib
import wave as wave_mod

import numpy as np
import pytest

PHONS = ["b a m a k a", "t u k a m a n i", "s a l a m u n", "k a t a b a",
         "m i n h u m", "d a r a s a t i"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i, phon in enumerate(PHONS):
        n = 11025 + 2048 * i  # 0.5-1.0 s
        t = np.arange(n) / 22050.0
        sig = (0.3 * np.sin(2 * np.pi * (120 + 15 * i) * t)
               + 0.05 * rng.standard_normal(n)).astype(np.float32)
        pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2")
        with wave_mod.open(str(wav_dir / f"s{i}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(22050)
            f.writeframes(pcm.tobytes())
        lines.append(f'"s{i}.wav" "{phon}"')
    (root / "train.txt").write_text("\n".join(lines[:4]) + "\n")
    (root / "test.txt").write_text("\n".join(lines[4:]) + "\n")
    return root, wav_dir


def _write_config(root, wav_dir, tmp_path, extra):
    cfg = {
        "restore_model": "",
        "log_dir": str(tmp_path / "logs"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "train_wavs_path": str(wav_dir),
        "train_labels": str(root / "train.txt"),
        "test_wavs_path": str(wav_dir),
        "test_labels": str(root / "test.txt"),
        "label_pattern": '"(?P<filename>.*)" "(?P<phonemes>.*)"',
        "f0_dict_path": "",
        "f0_mean": 130.05478, "f0_std": 22.86267,
        "g_lr": 1.0e-4, "g_beta1": 0.9, "g_beta2": 0.999,
        "d_lr": 1.0e-4, "d_beta1": 0.5, "d_beta2": 0.9,
        "n_save_states_iter": 100, "n_save_backup_iter": 1000,
        "epochs": 1,
    }
    cfg.update(extra)
    import yaml
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def _val_scalars(log_dir):
    rows = []
    for p in pathlib.Path(log_dir).rglob("*.jsonl"):
        for line in p.read_text().splitlines():
            row = json.loads(line)
            if any(k.startswith("val/") for k in row):
                rows.append(row)
    return rows


def test_train_fastpitch_cli_with_validation(corpus, tmp_path):
    from tts_arabic_tpu.apps import train_fastpitch
    root, wav_dir = corpus
    cfg = _write_config(root, wav_dir, tmp_path, {
        "max_lengths": [30000], "batch_sizes": [2],
    })
    train_fastpitch.main(["--config", str(cfg), "--epochs", "1",
                          "--no-mesh"])
    assert (tmp_path / "ckpt").exists()
    vals = _val_scalars(tmp_path / "logs")
    assert vals and any(np.isfinite(v) for row in vals
                        for k, v in row.items() if k == "val/loss")


def test_train_tacotron_cli_with_validation(corpus, tmp_path):
    from tts_arabic_tpu.apps import train_tacotron
    root, wav_dir = corpus
    cfg = _write_config(root, wav_dir, tmp_path, {
        "batch_size": 2, "decoder_max_step": 200, "grad_clip_thresh": 1.0,
        "cache_dataset": False,
    })
    train_tacotron.main(["--config", str(cfg), "--epochs", "1", "--no-mesh"])
    assert (tmp_path / "ckpt").exists()
    vals = _val_scalars(tmp_path / "logs")
    assert vals and any(np.isfinite(v) for row in vals
                        for k, v in row.items() if k == "val/loss")


def test_train_tacotron_cli_balanced_sampling(corpus, tmp_path):
    """balanced_sampling loads the weights file and drives the epoch order
    (reference train.py:150-156; the flag was previously unwired)."""
    from tts_arabic_tpu.apps import train_tacotron
    root, wav_dir = corpus
    weights = tmp_path / "sampler_weights.npy"
    np.save(weights, np.asarray([1.0, 1.0, 1.0, 5.0]))
    cfg = _write_config(root, wav_dir, tmp_path, {
        "batch_size": 2, "decoder_max_step": 200, "grad_clip_thresh": 1.0,
        "cache_dataset": False, "balanced_sampling": True,
        "sampler_weights_file": str(weights),
    })
    train_tacotron.main(["--config", str(cfg), "--epochs", "1", "--no-mesh"])
    assert (tmp_path / "ckpt").exists()


def test_batched_view_sampler_order():
    from tts_arabic_tpu.apps.train_tacotron import _BatchedView
    from tts_arabic_tpu.data import WeightedSampler

    class _DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return (np.zeros(3, np.int32), np.zeros((80, 10), np.float32))

    sampler = WeightedSampler(np.ones(6), seed=1)
    bv = _BatchedView(_DS(), 2, sampler=sampler)
    assert sorted(bv.order) == list(range(6))  # permutation, no repeats
    o1 = bv.order.copy()
    bv.shuffle()
    assert sorted(bv.order) == list(range(6))
    # sampler-driven reshuffle must actually change the order: one
    # coincidence is possible (6! orders), five in a row is not
    changed = False
    for _ in range(5):
        if not np.array_equal(o1, bv.order):
            changed = True
            break
        bv.shuffle()
    assert changed
