"""Datasets and batching for training.

Host-side equivalents of the reference data pipeline (`utils/data.py`):
- label-file parsing via a configurable regex with named groups
  arabic/phonemes/buckwalter/filename/filestem (`_process_line`, data.py:78-97)
- wav -> 22050 Hz log-mel (clamp 1e-5), internal-silence stripping below
  -10 mean-log energy with trailing silence kept (`remove_silence`,
  data.py:59-67)
- FastPitch extras: f0 lookup + zero-preserving normalization
  (data.py:50-57), L2-over-bins energy, beta-binomial prior (data.py:248-250)
- length-bucketed dynamic batching (`DynBatchDataset`, data.py:258-307)

TPU-first difference: collate pads every batch to STATIC bucket shapes
(text to multiples of 16, mel to the bucket ceiling) so each bucket
signature compiles exactly once.
"""
from __future__ import annotations

import os
import pathlib
import re
from typing import List, Optional

import numpy as np

from .. import text as text_frontend
from ..audio.io import load_wav
from ..audio.mel import MelConfig, log_mel_numpy
from ..align.prior import BetaBinomialInterpolator


def parse_label_line(pattern: str, line: str):
    """(phonemes, filename) from one label line (data.py:78-97)."""
    match = re.search(pattern, line)
    if match is None:
        raise ValueError(f"no match for line: {line!r}")
    d = match.groupdict()
    if "arabic" in d:
        phonemes = text_frontend.arabic_to_phonemes(d["arabic"])
    elif "phonemes" in d:
        phonemes = d["phonemes"]
    elif "buckwalter" in d:
        phonemes = text_frontend.buckwalter_to_phonemes(d["buckwalter"])
    else:
        raise ValueError("pattern must capture arabic/phonemes/buckwalter")
    if "filename" in d:
        filename = d["filename"]
    elif "filestem" in d:
        filename = f"{d['filestem']}.wav"
    else:
        raise ValueError("pattern must capture filename/filestem")
    return phonemes, filename


def normalize_pitch(pitch: np.ndarray, mean: float, std: float) -> np.ndarray:
    """Zero-preserving z-score (data.py:50-57)."""
    zeros = pitch == 0.0
    out = (pitch - mean) / std
    out[zeros] = 0.0
    return out


def silence_keep_mask(energy_per_frame: np.ndarray,
                      thresh: float = -10.0) -> np.ndarray:
    """Frames to keep: energy above thresh, plus all trailing silence
    (data.py:59-67 keeps the tail run of silent frames)."""
    keep = energy_per_frame > thresh
    i = len(keep) - 1
    while i > 0 and not keep[i]:
        keep[i] = True
        i -= 1
    return keep


DEFAULT_LABEL_PATTERN = '"(?P<filename>.*)" "(?P<phonemes>.*)"'


class ArabDataset:
    """Tokenized transcript + log-mel dataset (reference `ArabDataset`,
    data.py:100-167)."""

    def __init__(self, txtpath, wavpath,
                 label_pattern: str = DEFAULT_LABEL_PATTERN,
                 sr_target: int = 22050, cache: bool = False):
        self.wav_path = pathlib.Path(wavpath)
        self.sr_target = sr_target
        self.mel_cfg = MelConfig(sample_rate=sr_target)
        self.cache = {} if cache else None
        self.data = self._load_index(txtpath, label_pattern)

    def _load_index(self, txtpath, pattern):
        entries = []
        for l_idx, line in enumerate(
                pathlib.Path(txtpath).read_text().splitlines()):
            if not line.strip():
                continue
            try:
                phonemes, filename = parse_label_line(pattern, line)
            except Exception:
                print(f"invalid line {l_idx}: {line}")
                continue
            fpath = self.wav_path / filename
            if not fpath.exists():
                print(f"{fpath} does not exist")
                continue
            try:
                tokens = text_frontend.phonemes_to_tokens(phonemes)
                token_ids = np.asarray(text_frontend.tokens_to_ids(tokens),
                                       np.int32)
            except Exception:
                print(f"invalid phonemes at line {l_idx}: {line}")
                continue
            entries.append((token_ids, fpath, phonemes))
        return entries

    def _load_logmel(self, fpath):
        wave, _ = load_wav(fpath, target_sr=self.sr_target)
        mel_log = log_mel_numpy(wave, self.mel_cfg)  # [80, T]
        keep = silence_keep_mask(mel_log.mean(0))
        return mel_log[:, keep], keep

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        token_ids, fpath, _ = self.data[idx]
        if self.cache is not None and idx in self.cache:
            return self.cache[idx]
        mel_log, _ = self._load_logmel(fpath)
        item = (token_ids, mel_log)
        if self.cache is not None:
            self.cache[idx] = item
        return item


class ArabDatasetFastPitch(ArabDataset):
    """+ f0, energy, beta-binomial prior (reference `ArabDataset4FastPitch`,
    data.py:170-255). f0 dict: .npz ({wav_name: f0_per_frame}) or a torch
    .pt from the reference's extract_f0 script."""

    def __init__(self, txtpath, wavpath,
                 label_pattern: str = DEFAULT_LABEL_PATTERN,
                 f0_dict_path=None, f0_mean: float = 130.05478,
                 f0_std: float = 22.86267, sr_target: int = 22050,
                 cache: bool = False):
        super().__init__(txtpath, wavpath, label_pattern, sr_target, cache)
        self.f0_mean = f0_mean
        self.f0_std = f0_std
        self.prior = BetaBinomialInterpolator()
        self.f0_dict = self._load_f0(f0_dict_path) if f0_dict_path else None

    @staticmethod
    def _load_f0(path):
        path = str(path)
        if path.endswith(".npz"):
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=False)
        return {k: np.asarray(v) for k, v in raw.items()}

    def __getitem__(self, idx):
        # honor the cache here too — on-the-fly f0 (pyin) makes uncached
        # epochs host-bound far below the chip's 26 steps/s
        if self.cache is not None and idx in self.cache:
            return self.cache[idx]
        item = self._compute_item(idx)
        if self.cache is not None:
            self.cache[idx] = item
        return item

    def _compute_item(self, idx):
        token_ids, fpath, _ = self.data[idx]
        wave, _ = load_wav(fpath, target_sr=self.sr_target)
        mel_log = log_mel_numpy(wave, self.mel_cfg)
        keep = silence_keep_mask(mel_log.mean(0))
        mel_log = mel_log[:, keep]

        if self.f0_dict is not None:
            f0 = np.asarray(self.f0_dict[os.path.basename(str(fpath))],
                            np.float32)
        else:  # compute on the fly
            from .f0 import estimate_f0
            f0 = estimate_f0(wave, self.sr_target,
                             hop_length=self.mel_cfg.hop_length)
        f0 = f0[: len(keep)][keep[: len(f0)]]
        pitch = normalize_pitch(f0.copy(), self.f0_mean,
                                self.f0_std)[None, :]  # [1, T]
        if pitch.shape[1] < mel_log.shape[1]:
            pitch = np.pad(pitch,
                           ((0, 0), (0, mel_log.shape[1] - pitch.shape[1])))
        pitch = pitch[:, : mel_log.shape[1]]

        energy = np.linalg.norm(mel_log, ord=2, axis=0)
        attn_prior = self.prior(mel_log.shape[1], len(token_ids))
        return {
            "token_ids": token_ids,
            "mel": mel_log,            # [80, T]
            "pitch": pitch,            # [1, T]
            "energy": energy,          # [T]
            "attn_prior": attn_prior,  # [T, n_tokens]
        }


class DynBatchDataset:
    """Mel-length-bucketed dynamic batching (reference `DynBatchDataset`,
    data.py:258-307): bucket limits `max_lengths` with per-bucket batch
    sizes; `shuffle()` rebuilds the id batches each epoch."""

    def __init__(self, dataset: ArabDatasetFastPitch,
                 max_lengths=(1000, 1300, 1850, 30000),
                 batch_sizes=(10, 8, 6, 4), lengths: Optional[List[int]] = None,
                 seed: int = 0):
        self.dataset = dataset
        self.bounds = [0] + list(max_lengths)
        self.batch_sizes = list(batch_sizes)
        self.rng = np.random.default_rng(seed)
        if lengths is None:
            lengths = [self._estimate_len(i) for i in range(len(dataset))]
        self.lengths = lengths
        self.id_batches = []
        self.shuffle()

    def _estimate_len(self, i):
        # mel frames ~ wav samples / hop; avoids decoding audio up front
        _, fpath, _ = self.dataset.data[i]
        from scipy.io import wavfile
        import wave as wavmod
        with wavmod.open(str(fpath), "rb") as w:
            n = w.getnframes()
            sr = w.getframerate()
        return int(n * self.dataset.sr_target / sr
                   / self.dataset.mel_cfg.hop_length)

    def shuffle(self):
        per_bs = {b: [] for b in self.batch_sizes}
        for i, L in enumerate(self.lengths):
            b_idx = next(k for k in range(len(self.bounds) - 1)
                         if self.bounds[k] <= L < self.bounds[k + 1])
            per_bs[self.batch_sizes[b_idx]].append(i)
        batches = []
        for bs, ids in per_bs.items():
            ids = list(ids)
            self.rng.shuffle(ids)
            batches += [ids[k: k + bs] for k in range(0, len(ids), bs)]
        self.rng.shuffle(batches)
        self.id_batches = batches

    def __len__(self):
        return len(self.id_batches)

    def __getitem__(self, idx):
        return [self.dataset[i] for i in self.id_batches[idx]]


# --- collate: static-shape padded batches -----------------------------------

def _ceil_to(n, m):
    return ((n + m - 1) // m) * m


def collate_fastpitch(batch: List[dict], text_mult: int = 16,
                      mel_mult: int = 64) -> dict:
    """Pad a list of ArabDatasetFastPitch items to bucket shapes.

    Returns feature-last arrays ready for the FastPitch train step:
    tokens [B, T_txt], mel_tgt [B, T_mel, 80], pitch_dense [B, 1, T_mel],
    energy_dense [B, T_mel], attn_prior [B, T_mel, T_txt], lens.
    """
    B = len(batch)
    t_max = _ceil_to(max(len(s["token_ids"]) for s in batch), text_mult)
    m_max = _ceil_to(max(s["mel"].shape[1] for s in batch), mel_mult)
    n_mels = batch[0]["mel"].shape[0]

    tokens = np.zeros((B, t_max), np.int32)
    token_lens = np.zeros((B,), np.int32)
    mel = np.zeros((B, m_max, n_mels), np.float32)
    mel_lens = np.zeros((B,), np.int32)
    pitch = np.zeros((B, 1, m_max), np.float32)
    energy = np.zeros((B, m_max), np.float32)
    prior = np.zeros((B, m_max, t_max), np.float32)

    for i, s in enumerate(batch):
        nt = len(s["token_ids"])
        nm = s["mel"].shape[1]
        tokens[i, :nt] = s["token_ids"]
        token_lens[i] = nt
        mel[i, :nm] = s["mel"].T
        mel_lens[i] = nm
        pitch[i, :, :nm] = s["pitch"][:, :nm]
        energy[i, :nm] = s["energy"][:nm]
        prior[i, :nm, :nt] = s["attn_prior"][:nm, :nt]

    return {"tokens": tokens, "token_lens": token_lens, "mel_tgt": mel,
            "mel_lens": mel_lens, "pitch_dense": pitch,
            "energy_dense": energy, "attn_prior": prior}


def collate_tacotron(batch: List[tuple], text_mult: int = 16,
                     mel_mult: int = 64) -> dict:
    """Pad (token_ids, log_mel) pairs; gate target is 1 from each sample's
    last frame onward (reference `text_mel_collate_fn`, data.py:13-47)."""
    B = len(batch)
    t_max = _ceil_to(max(len(t) for t, _ in batch), text_mult)
    m_max = _ceil_to(max(m.shape[1] for _, m in batch), mel_mult)
    n_mels = batch[0][1].shape[0]

    tokens = np.zeros((B, t_max), np.int32)
    token_lens = np.zeros((B,), np.int32)
    mel = np.zeros((B, m_max, n_mels), np.float32)
    gate = np.zeros((B, m_max), np.float32)
    mel_lens = np.zeros((B,), np.int32)
    for i, (t, m) in enumerate(batch):
        tokens[i, : len(t)] = t
        token_lens[i] = len(t)
        mel[i, : m.shape[1]] = m.T
        gate[i, m.shape[1] - 1:] = 1.0
        mel_lens[i] = m.shape[1]
    return {"tokens": tokens, "token_lens": token_lens, "mel_tgt": mel,
            "gate_tgt": gate, "mel_lens": mel_lens}


class VocoderSegmentDataset:
    """Batches of random fixed-length waveform crops for vocoder GAN
    training (upstream HiFi-GAN dataset semantics: one fresh random
    segment per utterance visit; clips shorter than the segment are
    zero-padded). Yields WHOLE batches, DynBatchDataset-style, so
    `train.trainer.Trainer` can index batches directly. The reference
    repo has no vocoder trainer (SURVEY.md §2.6 — its vocoder ships
    pretrained); segment/batch defaults follow the published recipe.

    `segment_length` must be a hop multiple: `audio/mel.py` pads
    (n_fft-hop)/2 per side, so S samples give exactly S/hop mel frames
    and the generator output aligns sample-for-sample with the crop."""

    def __init__(self, txtpath, wavpath,
                 label_pattern: str = DEFAULT_LABEL_PATTERN,
                 segment_length: int = 8192, batch_size: int = 16,
                 sr_target: int = 22050, seed: int = 0,
                 cache: bool = False):
        if segment_length % 256:
            raise ValueError("segment_length must be a hop (256) multiple")
        self.files = [e[1] for e in ArabDataset(
            txtpath, wavpath, label_pattern, sr_target).data]
        if not self.files:
            raise ValueError(f"no usable wav entries in {txtpath}")
        self.segment_length = segment_length
        self.batch_size = batch_size
        self.sr_target = sr_target
        self.rng = np.random.default_rng(seed)
        self.cache = {} if cache else None
        self.shuffle()

    def shuffle(self):
        order = self.rng.permutation(len(self.files))
        self.batches = [order[i: i + self.batch_size]
                        for i in range(0, len(order), self.batch_size)]

    def _load(self, idx: int) -> np.ndarray:
        if self.cache is not None and idx in self.cache:
            return self.cache[idx]
        wave, _ = load_wav(self.files[idx], target_sr=self.sr_target)
        if self.cache is not None:
            self.cache[idx] = wave
        return wave

    def __len__(self):
        return len(self.batches)

    def __getitem__(self, b_idx: int):
        out = []
        for idx in self.batches[b_idx]:
            wave = self._load(int(idx))
            S = self.segment_length
            if len(wave) >= S:
                start = int(self.rng.integers(0, len(wave) - S + 1))
                out.append(wave[start: start + S])
            else:
                out.append(np.pad(wave, (0, S - len(wave))))
        return out


def collate_vocoder(batch: List[np.ndarray]) -> dict:
    """Equal-length waveform crops -> {"wave": [B, S]} float32."""
    return {"wave": np.stack(batch).astype(np.float32)}


class WeightedSampler:
    """Weighted sampling without replacement (reference `train.py:150-156`
    balanced_sampling via torch WeightedRandomSampler; weights file from
    `data/sampler/`). Produces a full permutation-like id order biased by
    the weights each epoch."""

    def __init__(self, weights, seed: int = 0):
        self.weights = np.asarray(weights, np.float64)
        self.weights = self.weights / self.weights.sum()
        self.rng = np.random.default_rng(seed)

    @classmethod
    def from_file(cls, path, seed: int = 0):
        path = str(path)
        if path.endswith(".npy") or path.endswith(".npz"):
            w = np.load(path)
            if hasattr(w, "files"):
                w = w[w.files[0]]
        else:
            import torch
            w = np.asarray(torch.load(path, map_location="cpu",
                                      weights_only=False))
        return cls(w, seed)

    def sample(self, n=None):
        n = n if n is not None else len(self.weights)
        return self.rng.choice(len(self.weights), size=n, replace=False,
                               p=self.weights)
