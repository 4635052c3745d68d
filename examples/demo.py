"""Walkthrough of the framework's API (reference `test.ipynb` equivalent).

Run cells top-to-bottom (or as a script):

    python examples/demo.py

Uses random weights when no checkpoint is given; pass reference `.pth`
paths to hear real speech (see `python -m tts_arabic_tpu.apps.download`).
"""
# %% setup
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from tts_arabic_tpu.infer import FastPitch2Wave, FastPitchTTS, Tacotron2Wave
from tts_arabic_tpu.audio import save_wav

CKPT = None  # e.g. "pretrained/fastpitch_ar_adv.pth"
VOCODER_SD = None  # e.g. "pretrained/hifigan-asc-v1/hifigan-asc.pth"

def _nudge_random_durations(pipeline_model):
    """Random-init FastPitch predicts exp(0)-1 = 0 frames per token; bias
    the duration head so the no-checkpoint demo produces audible lengths.
    Not needed with trained checkpoints."""
    fc = pipeline_model.variables["params"]["duration_predictor"]["fc"]
    fc["bias"] = fc["bias"] + 2.0


# %% FastPitch: text -> mel
fastpitch = FastPitchTTS(CKPT)
if CKPT is None:
    _nudge_random_durations(fastpitch)
mel = fastpitch.ttmel("اَلسَّلامُ عَلَيكُم يَا صَدِيقِي")
print("mel:", mel.shape)  # [80, T]

# %% FastPitch2Wave: end-to-end tts with denoiser
tts = FastPitch2Wave(CKPT, vocoder_sd=VOCODER_SD)
if CKPT is None:
    _nudge_random_durations(tts.model)
wave = tts.tts("اَلسَّلامُ عَلَيكُم يَا صَدِيقِي", denoise=0.005)
save_wav("sample_fastpitch.wav", np.asarray(wave), tts.sample_rate)

# %% Buckwalter input + speed/pitch controls
wave = tts.tts(">als~alAmu Ealaykum yA Sadiyqiy" if not tts.model.arabic_in
               else "اَلسَّلامُ عَلَيكُم", speed=0.9, pitch_mul=1.1,
               pitch_add=0.2)

# %% vowelizer A/B (reference test.ipynb cells 6-9): diacritize unvocalized
# text with each model, compare the vowelizations, then synthesize from each
from tts_arabic_tpu.diacritizers import load_vowelizer

unvocalized = "السلام عليكم يا صديقي"
for name in ("shakkala", "shakkelha"):
    try:
        vowelized = load_vowelizer(name).predict(unvocalized)
        print(f"{name}: {vowelized}")
        w = tts.tts(unvocalized, vowelizer=name)
        print(f"  -> {len(w) / tts.sample_rate:.2f}s audio")
    except FileNotFoundError:
        print(name, "weights not downloaded; skipping")

# %% batched synthesis (list input)
numbers = ["صِفر", "واحِد", "إِثنان", "ثَلاثَة", "أَربَعَة", "خَمسَة",
           "سِتَّة", "سَبعَة", "ثَمانِيَة", "تِسعَة", "عَشَرَة"]
waves = tts.tts(numbers, batch_size=8)
print("batch:", [round(len(w) / tts.sample_rate, 2) for w in waves])

# %% multispeaker + Vocos backend (reference test.ipynb cells 10-13)
# With the published checkpoint: FastPitch2Wave("pretrained/fastpitch_ar_ms
# .pth", vocoder_type="vocos"); the cell below runs the same path on a
# random-init 4-speaker model.
from tts_arabic_tpu.models.fastpitch import FastPitchConfig

MS_CKPT = None  # e.g. "pretrained/fastpitch_ar_ms.pth"
ms = FastPitch2Wave(MS_CKPT, vocoder_type="vocos",
                    config=None if MS_CKPT else FastPitchConfig(n_speakers=4))
if MS_CKPT is None:
    _nudge_random_durations(ms.model)
for speaker_id in range(2):
    w = ms.tts("مَرحَباً بِكُم", speaker_id=speaker_id, pitch_mul=1.05)
    print(f"speaker {speaker_id}: {len(w) / ms.sample_rate:.2f}s (vocos)")

# %% Tacotron2 (autoregressive)
taco = Tacotron2Wave(None)  # or "pretrained/tacotron2_ar_adv.pth"
taco.model.decoder_max_step = 256  # keep the random-weight demo short
wave = taco.tts("صِفر", denoise=0.0)
print("tacotron2:", len(wave) / taco.sample_rate, "s")

# %% streaming (beyond the reference): chunks arrive as they're vocoded.
# FastPitch streams the vocoder over a parallel decode; Tacotron2 streams
# the autoregressive decode itself (first audio after ~one segment).
for i, chunk in enumerate(tts.stream("اَلسَّلامُ عَلَيكُم يَا صَدِيقِي",
                                     chunk_frames=128)):
    print(f"fastpitch chunk {i}: {len(chunk) / tts.sample_rate:.2f}s")
for i, chunk in enumerate(taco.stream("صِفر", chunk_frames=64, denoise=0.0)):
    print(f"tacotron2 chunk {i}: {len(chunk) / taco.sample_rate:.2f}s")

# %% paragraphs (beyond the reference): sentence-split -> batched -> joined
from tts_arabic_tpu.infer import tts_long

paragraph = "مَرحَباً بِكُم. كَيفَ حالُكُم؟ أَهلاً وَسَهلاً!"
long_wave = tts_long(tts, paragraph, pause_s=0.2)
print("paragraph:", len(long_wave) / tts.sample_rate, "s")

# %% compact transfers (beyond the reference): waves can leave the chip as
# int16 PCM or uint8 mu-law (quarter of the f32 transfer, ~38 dB — the
# D2H link is the serving bottleneck on remote accelerators)
from tts_arabic_tpu.audio import mulaw_decode

codes = tts.tts("صِفر", out_int16="mulaw")
print("mulaw:", codes.dtype, len(codes), "->",
      mulaw_decode(codes).dtype)

# %% sequence-parallel vocoding (multi-chip): ONE utterance's time axis
# sharded over the mesh — exact vs the single-device call. Run under
# XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
# to try on a virtual mesh without TPU pod hardware.
import jax

if len(jax.devices()) > 1:
    from tts_arabic_tpu.parallel import make_mesh, sp_vocode
    from tts_arabic_tpu.vocoder.hifigan import Generator

    mel = tts.model.ttmel("اَلسَّلامُ عَلَيكُم")  # [n_mels, T]
    gen = Generator(tts.vocoder_config)
    wave_sp = sp_vocode(lambda v, m: gen.apply(v, m),
                        tts.vocoder_vars, mel.T[None], make_mesh())
    print("sp_vocode:", wave_sp.shape)

# %% audio playback (reference test.py:91-96 / test.ipynb playback cells):
# plays through the default output device when `sounddevice` is installed
# (optional dependency, absent in CI); saves to disk either way.
out_dir = pathlib.Path("samples/demo")
out_dir.mkdir(parents=True, exist_ok=True)
save_wav(out_dir / "demo.wav", np.asarray(wave), taco.sample_rate)
print("saved:", out_dir / "demo.wav")
try:
    import sounddevice

    sounddevice.play(np.asarray(wave), taco.sample_rate, blocking=True)
except Exception as e:  # headless / no audio device / not installed
    print(f"(playback unavailable: {e})")
