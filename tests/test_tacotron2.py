"""Tacotron2 tests: LSTM parity vs torch, packed BiLSTM semantics,
teacher-forced scan, autoregressive early stopping."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.models.tacotron2 import (BiLSTM, Tacotron2,
                                             Tacotron2Config, lstm_step,
                                             _reverse_by_length)

CFG = Tacotron2Config(
    n_symbols=40, symbol_embedding_dim=32, encoder_embedding_dim=32,
    num_speakers=1, decoder_rnn_dim=48, attention_rnn_dim=48,
    attention_hidden_dim=16, attention_location_n_filters=4,
    attention_location_kernel_size=7, prenet_dim=16,
    postnet_embedding_dim=32, postnet_n_convolutions=3, n_mels=20,
    decoder_max_step=64)


def test_lstm_step_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    cell = torch.nn.LSTMCell(6, 10)
    p = {
        "wi": cell.weight_ih.detach().numpy().T,
        "wh": cell.weight_hh.detach().numpy().T,
        "bi": cell.bias_ih.detach().numpy(),
        "bh": cell.bias_hh.detach().numpy(),
    }
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 6)).astype(np.float32)
    h = rng.standard_normal((3, 10)).astype(np.float32)
    c = rng.standard_normal((3, 10)).astype(np.float32)
    ht, ct = cell(torch.from_numpy(x), (torch.from_numpy(h),
                                        torch.from_numpy(c)))
    hj, cj = lstm_step(jax.tree.map(jnp.asarray, p), jnp.asarray(x),
                       jnp.asarray(h), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(hj), ht.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cj), ct.detach().numpy(),
                               atol=1e-5)


def test_bilstm_matches_torch_packed():
    """Our BiLSTM must reproduce torch's packed-sequence bidirectional LSTM
    (what torchaudio's encoder uses) including per-sample reverse starts."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    lstm = torch.nn.LSTM(8, 5, bidirectional=True, batch_first=True)
    sd = {k: v.detach().numpy() for k, v in lstm.state_dict().items()}
    params = {"fwd": {"wi": sd["weight_ih_l0"].T, "wh": sd["weight_hh_l0"].T,
                      "bi": sd["bias_ih_l0"], "bh": sd["bias_hh_l0"]},
              "bwd": {"wi": sd["weight_ih_l0_reverse"].T,
                      "wh": sd["weight_hh_l0_reverse"].T,
                      "bi": sd["bias_ih_l0_reverse"],
                      "bh": sd["bias_hh_l0_reverse"]}}

    rng = np.random.default_rng(2)
    B, T = 3, 7
    x = rng.standard_normal((B, T, 8)).astype(np.float32)
    lens = np.array([7, 5, 3])
    for b, L in enumerate(lens):
        x[b, L:] = 0.0

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lens), batch_first=True)
    out_p, _ = lstm(packed)
    out_ref, _ = torch.nn.utils.rnn.pad_packed_sequence(out_p,
                                                        batch_first=True)
    out_ref = out_ref.detach().numpy()

    model = BiLSTM(5)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 jnp.asarray(lens)))
    for b, L in enumerate(lens):
        np.testing.assert_allclose(out[b, :L], out_ref[b, :L], atol=1e-5)


def test_reverse_by_length():
    x = jnp.asarray(np.arange(12).reshape(2, 6, 1).astype(np.float32))
    lens = jnp.asarray([4, 6])
    r = np.asarray(_reverse_by_length(x, lens))
    assert list(r[0, :4, 0]) == [3, 2, 1, 0]
    assert list(r[0, 4:, 0]) == [4, 5]  # padding left in place
    assert list(r[1, :, 0]) == [11, 10, 9, 8, 7, 6]


@pytest.fixture(scope="module")
def t2():
    model = Tacotron2(CFG)
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, CFG.n_symbols, (2, 9)).astype(np.int32)
    token_lens = np.array([9, 6], np.int32)
    mel = rng.standard_normal((2, 12, CFG.n_mels)).astype(np.float32)
    mel_lens = np.array([12, 10], np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(token_lens),
        jnp.asarray(mel), jnp.asarray(mel_lens))
    return model, variables, tokens, token_lens, mel, mel_lens


def test_teacher_forced_shapes(t2):
    model, variables, tokens, token_lens, mel, mel_lens = t2
    mel_out, mel_post, gates, aligns = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(token_lens),
        jnp.asarray(mel), jnp.asarray(mel_lens))
    assert mel_out.shape == mel.shape and mel_post.shape == mel.shape
    assert gates.shape == (2, 12)
    assert aligns.shape == (2, 12, 9)
    # alignment rows are distributions over text
    np.testing.assert_allclose(np.asarray(aligns).sum(-1),
                               np.ones((2, 12)), atol=1e-5)
    # masked text positions get zero attention
    assert np.asarray(aligns)[1, :, 6:].max() < 1e-6


def test_infer_runs_and_early_stops(t2):
    model, variables, tokens, token_lens, _, _ = t2
    # bias the gate so the stop token fires quickly
    variables["params"]["gate_layer"]["bias"] = jnp.asarray([5.0])
    out = model.apply(variables, jnp.asarray(tokens),
                      jnp.asarray(token_lens), max_steps=32,
                      method=Tacotron2.infer)
    lens = np.asarray(out["mel_lens"])
    assert (lens >= 1).all() and (lens <= 32).all()
    # gate bias 5 -> sigmoid >0.5 at step 0 -> every sample stops after 1
    assert (lens == 1).all()


def test_infer_respects_max_steps(t2):
    model, variables, tokens, token_lens, _, _ = t2
    variables["params"]["gate_layer"]["bias"] = jnp.asarray([-50.0])
    out = model.apply(variables, jnp.asarray(tokens),
                      jnp.asarray(token_lens), max_steps=16,
                      method=Tacotron2.infer)
    assert (np.asarray(out["mel_lens"]) == 16).all()
    assert out["mel"].shape == (2, 16, CFG.n_mels)


def test_teacher_scan_equals_eager_steps(t2):
    """The lax.scan teacher-forced decode must equal a hand-rolled
    step-by-step decode (SURVEY.md §4 item 3)."""
    model, variables, tokens, token_lens, mel, mel_lens = t2
    mel_out, _, gates, aligns = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(token_lens),
        jnp.asarray(mel), jnp.asarray(mel_lens))

    def eager(variables, tokens, token_lens, mel):
        def run(mdl):
            memory = mdl.encode(jnp.asarray(tokens), jnp.asarray(token_lens))
            processed = mdl.memory_layer(memory)
            from tts_arabic_tpu.models.layers import sequence_mask
            mask = sequence_mask(jnp.asarray(token_lens), memory.shape[1])
            state = mdl._init_decoder_state(memory)
            go = jnp.zeros((mel.shape[0], 1, mdl.config.n_mels))
            dec_in = jnp.concatenate([go, jnp.asarray(mel[:, :-1])], axis=1)
            pre = mdl._prenet(dec_in, jax.random.PRNGKey(0))
            frames = []
            for t in range(mel.shape[1]):
                state, f, g, w = mdl._decode_step(
                    state, pre[:, t], memory, processed, mask, train=False)
                frames.append(f)
            return jnp.stack(frames, axis=1)
        return nn_apply(model, variables, run)

    from flax import linen as nn_mod

    def nn_apply(model, variables, fn):
        return model.apply(variables, method=fn)

    eager_out = eager(variables, tokens, token_lens, mel)
    np.testing.assert_allclose(np.asarray(mel_out), np.asarray(eager_out),
                               atol=1e-5)


def test_full_infer_matches_reference():
    """End-to-end autoregressive infer differential vs an independent torch
    implementation with the reference's exact state_dict layout
    (tests/t2_oracle.py; torchaudio — where the reference's decoder lives,
    tacotron2_ms.py:113 — is not installed in this environment, so the
    oracle recreates its structure from torch primitives).

    Oracle runs per-sample at EXACT length (the reference wrapper's
    `ttmel_single` semantics) with deterministic prenet (`prenet_dropout=0`
    here); ours runs the two samples as one padded batch, so this also
    checks pad-invariance of the conv encoder + postnet, the masked
    attention, and the `tacotron2_params_from_torch` key mapping."""
    torch = pytest.importorskip("torch")
    from t2_oracle import Tacotron2Oracle
    from tts_arabic_tpu.models.torch_import import tacotron2_params_from_torch

    kw = dict(n_symbol=40, num_speakers=4, speaker_embedding_dim=8,
              symbol_embedding_dim=32, encoder_embedding_dim=32,
              decoder_rnn_dim=48, decoder_max_step=50,
              attention_rnn_dim=48, attention_hidden_dim=16,
              attention_location_n_filter=4,
              attention_location_kernel_size=15, prenet_dim=16,
              postnet_embedding_dim=32, postnet_n_convolution=3, n_mels=20)
    torch.manual_seed(0)
    ref = Tacotron2Oracle(**kw).eval()
    with torch.no_grad():
        # keep the stop gate shut so both sides decode all 50 steps
        ref.decoder.gate_layer.linear_layer.bias -= 5.0

    cfg = Tacotron2Config(
        n_symbols=40, num_speakers=4, speaker_embedding_dim=8,
        symbol_embedding_dim=32, encoder_embedding_dim=32,
        decoder_rnn_dim=48, decoder_max_step=50, attention_rnn_dim=48,
        attention_hidden_dim=16, attention_location_n_filters=4,
        attention_location_kernel_size=15, prenet_dim=16,
        postnet_embedding_dim=32, postnet_n_convolutions=3, n_mels=20,
        prenet_dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = tacotron2_params_from_torch(sd, cfg)
    model = Tacotron2(cfg)

    rng = np.random.default_rng(7)
    tokens = rng.integers(1, 40, (2, 11)).astype(np.int32)
    real_lens = [11, 7]
    tokens[1, real_lens[1]:] = 0

    # oracle: per-sample, exact length
    refs = []
    with torch.no_grad():
        for b in range(2):
            t = torch.from_numpy(tokens[b:b + 1, : real_lens[b]]).long()
            mel_post, mel_lens, align = ref.infer(
                t, speaker_ids=torch.tensor([b + 1]),
                lengths=torch.tensor([real_lens[b]]))
            refs.append((mel_post[0].numpy(), int(mel_lens[0]),
                         align[0].numpy()))

    # ours: one padded batch; per-row speaker ids
    out = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(real_lens),
        jnp.asarray([1, 2], jnp.int32), max_steps=50,
        rng=jax.random.PRNGKey(0), method=Tacotron2.infer)
    mel_post = np.asarray(out["mel_postnet"])   # [B, T, n_mels]
    mel_lens = np.asarray(out["mel_lens"])
    aligns = np.asarray(out["alignments"])      # [B, T, T_txt]

    for b, (mel_ref, len_ref, align_ref) in enumerate(refs):
        assert mel_lens[b] == len_ref == 50
        np.testing.assert_allclose(mel_post[b].T, mel_ref,
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(aligns[b, :, : real_lens[b]],
                                   align_ref, atol=1e-3)
