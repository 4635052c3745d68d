"""Data pipeline tests with a synthetic mini-corpus."""
import numpy as np
import pytest

from tts_arabic_tpu.audio import save_wav
from tts_arabic_tpu.data import (ArabDataset, ArabDatasetFastPitch,
                                 DynBatchDataset, collate_fastpitch,
                                 collate_tacotron, estimate_f0,
                                 normalize_pitch, parse_label_line,
                                 silence_keep_mask)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    lines = []
    phon = ["b a m aa + t i0 l", "< a h l a n + w a s a h l a n",
            "m a r H a b a n"]
    for i, p in enumerate(phon):
        n = 11025 + i * 4410
        t = np.arange(n) / 22050
        wav = (0.3 * np.sin(2 * np.pi * 150 * t)
               + 0.05 * rng.standard_normal(n)).astype(np.float32)
        save_wav(root / f"s{i}.wav", wav)
        lines.append(f'"s{i}.wav" "{p}"')
    (root / "labels.txt").write_text("\n".join(lines))
    return root


def test_parse_label_line_variants():
    p, f = parse_label_line('"(?P<filename>.*)" "(?P<phonemes>.*)"',
                            '"x.wav" "b a m"')
    assert p == "b a m" and f == "x.wav"
    p, f = parse_label_line(r"(?P<buckwalter>.*)\|(?P<filestem>.*)",
                            "*ahaba|utt1")
    assert f == "utt1.wav" and "*" in p


def test_silence_mask_keeps_trailing():
    e = np.array([-12.0, -5, -5, -12, -5, -12, -12])
    keep = silence_keep_mask(e)
    # leading/internal silence dropped, trailing silence kept
    assert list(keep) == [False, True, True, False, True, True, True]


def test_normalize_pitch_zero_preserving():
    p = np.array([0.0, 130.0, 150.0, 0.0], np.float32)
    out = normalize_pitch(p.copy(), 130.0, 20.0)
    assert out[0] == 0.0 and out[3] == 0.0
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[2], 1.0, atol=1e-6)


def test_arab_dataset(corpus):
    ds = ArabDataset(corpus / "labels.txt", corpus)
    assert len(ds) == 3
    tokens, mel = ds[0]
    assert tokens.dtype == np.int32 and mel.shape[0] == 80
    assert np.isfinite(mel).all()


def test_fastpitch_dataset_and_collate(corpus):
    ds = ArabDatasetFastPitch(corpus / "labels.txt", corpus)
    items = [ds[i] for i in range(3)]
    for it in items:
        T = it["mel"].shape[1]
        assert it["pitch"].shape == (1, T)
        assert it["energy"].shape == (T,)
        assert it["attn_prior"].shape == (T, len(it["token_ids"]))
    batch = collate_fastpitch(items)
    B, T_mel, n_mels = batch["mel_tgt"].shape
    assert B == 3 and n_mels == 80 and T_mel % 64 == 0
    assert batch["tokens"].shape[1] % 16 == 0
    assert (batch["mel_lens"] <= T_mel).all()
    assert batch["attn_prior"].shape == (3, T_mel, batch["tokens"].shape[1])


def test_fastpitch_dataset_cache(corpus, monkeypatch):
    """cache=True must serve repeat items without recomputing (the flag
    was silently dead on ArabDatasetFastPitch: its __getitem__ override
    skipped the parent's cache)."""
    ds = ArabDatasetFastPitch(corpus / "labels.txt", corpus, cache=True)
    first = ds[0]
    calls = {"n": 0}

    def boom(self, idx):
        calls["n"] += 1
        raise AssertionError("cache miss: recomputed a cached item")

    monkeypatch.setattr(ArabDatasetFastPitch, "_compute_item", boom)
    again = ds[0]
    assert calls["n"] == 0
    np.testing.assert_array_equal(again["mel"], first["mel"])


def test_dynbatch_bucketing(corpus):
    ds = ArabDatasetFastPitch(corpus / "labels.txt", corpus)
    dyn = DynBatchDataset(ds, max_lengths=[50, 30000], batch_sizes=[2, 1])
    ids = sorted(i for b in dyn.id_batches for i in b)
    assert ids == [0, 1, 2]  # every sample appears exactly once
    batch = dyn[0]
    assert isinstance(batch, list) and isinstance(batch[0], dict)


def test_collate_tacotron(corpus):
    ds = ArabDataset(corpus / "labels.txt", corpus)
    batch = collate_tacotron([ds[i] for i in range(3)])
    B, T, _ = batch["mel_tgt"].shape
    assert batch["gate_tgt"].shape == (B, T)
    for i in range(B):
        L = batch["mel_lens"][i]
        assert batch["gate_tgt"][i, L - 1] == 1.0
        assert (batch["gate_tgt"][i, :L - 1] == 0).all()
        assert (batch["gate_tgt"][i, L:] == 1).all()


def test_f0_estimator_on_synthetic_tone():
    sr = 22050
    t = np.arange(sr) / sr
    for hz in (110.0, 220.0, 440.0):
        wav = 0.5 * np.sin(2 * np.pi * hz * t).astype(np.float32)
        f0 = estimate_f0(wav, sr)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        np.testing.assert_allclose(np.median(voiced), hz, rtol=0.02)
    # silence is unvoiced
    f0 = estimate_f0(np.zeros(sr, np.float32), sr)
    assert (f0 == 0).all()


# --- pyin robustness (reference uses librosa.pyin, scripts/extract_f0.py:19;
# these scenarios are where single-threshold YIN fails and pyin must not) ----

def _vibrato(sr, seconds=2.0, hz=220.0, depth=0.03, rate=5.0, noise=0.0,
             seed=1):
    t = np.arange(int(sr * seconds)) / sr
    f0t = hz * (1 + depth * np.sin(2 * np.pi * rate * t))
    ph = 2 * np.pi * np.cumsum(f0t) / sr
    x = np.sin(ph) + 0.5 * np.sin(2 * ph)
    if noise:
        x = x + np.random.default_rng(seed).normal(0, noise, len(t))
    return x.astype(np.float32), f0t


def test_pyin_tracks_vibrato():
    sr = 22050
    x, f0t = _vibrato(sr)
    f0 = estimate_f0(x, sr)  # pyin is the default
    truth = f0t[np.arange(len(f0)) * 256]
    v = f0 > 0
    assert v.mean() > 0.95
    rel = np.abs(f0[v] / truth[v] - 1)
    assert np.median(rel) < 0.02
    # the track actually follows the modulation (not a flat median pitch)
    assert f0[v].max() > 220 * 1.015 and f0[v].min() < 220 / 1.015


def test_pyin_voicing_under_noise():
    """At ~7 dB SNR single-threshold YIN drops most frames; pyin must not."""
    sr = 22050
    x, f0t = _vibrato(sr, noise=0.35)
    truth = f0t[np.arange(1 + len(x) // 256) * 256]
    f0 = estimate_f0(x, sr, method="pyin")
    v = f0 > 0
    assert v.mean() > 0.9
    assert np.median(np.abs(f0[v] / truth[: len(f0)][v] - 1)) < 0.02
    # document the failure mode the upgrade fixes
    f0_yin = estimate_f0(x, sr, method="yin")
    assert (f0_yin > 0).mean() < 0.6


def test_pyin_octave_stability():
    """Fundamental amplitude sweeps through the octave-ambiguity point:
    plain YIN flickers between f0 and 2*f0; pyin's Viterbi must hold one
    consistent track with zero octave hops."""
    sr = 22050
    f0_true = sr / 148
    t = np.arange(sr * 2) / sr
    amp = 0.25 + 0.2 * np.sin(2 * np.pi * 1.5 * t)
    x = (amp * np.sin(2 * np.pi * f0_true * t)
         + 0.9 * np.sin(2 * np.pi * 2 * f0_true * t)).astype(np.float32)
    f0 = estimate_f0(x, sr, method="pyin")
    v = f0[f0 > 0]
    ratio = v / f0_true
    hops = np.sum(np.abs(np.diff(np.log2(ratio))) > 0.5)
    assert hops == 0
    assert (np.abs(ratio - 1) < 0.06).mean() > 0.97
    f0_yin = estimate_f0(x, sr, method="yin")
    vy = f0_yin[f0_yin > 0] / f0_true
    assert np.sum(np.abs(np.diff(np.log2(vy))) > 0.5) >= 2  # yin DOES hop


# --- formant-synthesized pseudo-speech (VERDICT r2 #9): the synthetic-tone
# gates above never touch speech-like structure; this fixture has a glottal
# pulse train through formant resonators with jitter/shimmer, a breathy
# voiced stretch, a quiet voiced tail, unvoiced fricatives and silence,
# with exact ground-truth f0/voicing tracks --------------------------------

def _formant_voiced(rng, sr, n, f0_start, f0_end, jitter=0.006, shimmer=0.08,
                    breath=0.03,
                    formants=((660, 90), (1200, 110), (2600, 140))):
    from scipy.signal import lfilter
    f0t = np.linspace(f0_start, f0_end, n)
    j = lfilter([1.0], [1.0, -0.995], rng.normal(0, 1.0, n))
    j = j / (np.abs(j).max() + 1e-9)
    ph = 2 * np.pi * np.cumsum(f0t * (1 + jitter * j)) / sr
    imp = (np.diff(np.floor(ph / (2 * np.pi)), prepend=0.0) > 0).astype(float)
    amp = 1 + shimmer * lfilter([1.0], [1.0, -0.9], rng.normal(0, 1.0, n))
    out = imp * amp + breath * rng.normal(0, 0.02, n)
    for fc, bw in formants:
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * fc / sr
        out = lfilter([1 - r], [1, -2 * r * np.cos(th), r * r], out)
    return (out / (np.abs(out).max() + 1e-9)).astype(np.float32), f0t


def _pseudo_speech(sr=22050, hop=256, seed=1):
    from scipy.signal import lfilter
    rng = np.random.default_rng(seed)
    segs, truth = [], []

    def voiced(dur, a, b, amp=1.0, **kw):
        x, t = _formant_voiced(rng, sr, int(dur * sr), a, b, **kw)
        segs.append(amp * x)
        truth.append(t)

    def unvoiced(dur, color=0.9, level=0.25):
        n = int(dur * sr)
        x = lfilter([1 - color], [1, -color], rng.normal(0, 1.0, n))
        segs.append((level * x / (np.abs(x).max() + 1e-9)).astype(np.float32))
        truth.append(np.zeros(n))

    voiced(0.5, 120, 92)                      # modal vowel, falling contour
    unvoiced(0.22)                            # fricative
    voiced(0.5, 98, 138, breath=1.1, shimmer=0.14)   # breathy voice
    segs.append(np.zeros(int(0.2 * sr), np.float32))  # silence
    truth.append(np.zeros(int(0.2 * sr)))
    # octave bait: first formant parked on the 2nd harmonic
    voiced(0.45, 155, 112, formants=((260, 60), (1100, 110), (2500, 140)))
    unvoiced(0.15, color=0.7, level=0.18)
    voiced(0.35, 105, 125, amp=0.2, breath=0.5)      # quiet tail
    x = np.concatenate(segs)
    t = np.concatenate(truth)
    # estimate_f0 frames are centered at k*hop (center padding)
    frames = np.arange(1 + len(x) // hop) * hop
    return x, t[np.clip(frames, 0, len(t) - 1)]


def _f0_scores(f0, truth):
    n = min(len(f0), len(truth))
    f0, truth = f0[:n], truth[:n]
    pred_v, true_v = f0 > 0, truth > 0
    tp = (pred_v & true_v).sum()
    f1 = 2 * tp / (2 * tp + (pred_v & ~true_v).sum()
                   + (~pred_v & true_v).sum())
    both = pred_v & true_v
    cents = np.abs(1200 * np.log2(f0[both] / truth[both]))
    return float(f1), float(np.median(cents))


def test_pyin_pseudo_speech_accuracy():
    """pyin on pseudo-speech: voicing F1 >= 0.95, median error < 20 cents
    (the creak/breath/subharmonic territory the pure-tone gates miss)."""
    sr = 22050
    x, truth = _pseudo_speech(sr)
    f1, med_cents = _f0_scores(estimate_f0(x, sr, method="pyin"), truth)
    assert f1 >= 0.95, f1
    assert med_cents < 20.0, med_cents


def test_yin_fails_pseudo_speech_where_pyin_passes():
    """Single-threshold YIN drops breathy/quiet voiced frames that pyin's
    multi-threshold sweep keeps — the fixture discriminates the methods."""
    sr = 22050
    x, truth = _pseudo_speech(sr)
    f1_yin, _ = _f0_scores(estimate_f0(x, sr, method="yin"), truth)
    assert f1_yin < 0.92, f1_yin


def test_pyin_voicing_f1_composite():
    """tone | noise | tone | silence: voicing decision F1 >= 0.95."""
    sr, seg = 22050, 22050 // 2
    rng = np.random.default_rng(1)
    tone = np.sin(2 * np.pi * 180 * np.arange(seg) / sr)
    comp = np.concatenate([tone, rng.normal(0, 0.15, seg), tone,
                           np.zeros(seg)]).astype(np.float32)
    f0 = estimate_f0(comp, sr, method="pyin")
    fr = np.arange(len(f0)) * 256
    truth = (fr < seg) | ((fr >= 2 * seg) & (fr < 3 * seg))
    pred = f0 > 0
    tp = (pred & truth).sum()
    f1 = 2 * tp / (2 * tp + (pred & ~truth).sum() + (~pred & truth).sum())
    assert f1 >= 0.95
    # voiced segments carry the right pitch
    good = pred & truth
    assert np.median(np.abs(f0[good] / 180 - 1)) < 0.02
