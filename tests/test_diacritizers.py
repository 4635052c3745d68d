"""Diacritizer differential tests vs the reference torch implementations
(random weights shared through the state_dict importer)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_reference
from tts_arabic_tpu.diacritizers import Shakkala, Shakkelha
from tts_arabic_tpu.diacritizers.models import (_import_bilstm, _import_dense,
                                                hard_sigmoid)

TEXT = "ذهب الولد الى المدرسة"


def _np_sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_shakkala_parity(reference_dir):
    load_reference(reference_dir)
    from models.diacritizers.shakkala.network import Shakkala as RefShakkala
    torch.manual_seed(0)
    ref = RefShakkala().eval()
    sd = _np_sd(ref)
    params = {
        "emb": sd["emb_input.weight"],
        "lstm0": _import_bilstm(sd, "lstm0"),
        "bn0": {"scale": sd["bn0.weight"], "bias": sd["bn0.bias"],
                "mean": sd["bn0.running_mean"], "var": sd["bn0.running_var"]},
        "lstm1": _import_bilstm(sd, "lstm1"),
        "lstm2": _import_bilstm(sd, "lstm2"),
        "dense0": _import_dense(sd, "dense0"),
    }
    ours = Shakkala(params=params)
    out_ref, probs_ref = ref.predict(TEXT, return_probs=True)
    out, probs = ours.predict(TEXT, return_probs=True)
    np.testing.assert_allclose(probs, probs_ref[0].numpy(), atol=2e-5)
    assert out == out_ref


def test_shakkelha_parity(reference_dir):
    load_reference(reference_dir)
    from models.diacritizers.shakkelha.network import Shakkelha as RefShakkelha
    torch.manual_seed(1)
    ref = RefShakkelha().eval()
    sd = _np_sd(ref)
    params = {
        "emb": sd["emb0.weight"],
        "lstm0": _import_bilstm(sd, "lstm0"),
        "lstm1": _import_bilstm(sd, "lstm1"),
        "dense0": _import_dense(sd, "dense0"),
        "dense1": _import_dense(sd, "dense1"),
        "dense2": _import_dense(sd, "dense2"),
    }
    ours = Shakkelha(params=params)
    out_ref, probs_ref = ref.predict(TEXT, return_probs=True)
    out, probs = ours.predict(TEXT, return_probs=True)
    np.testing.assert_allclose(probs, probs_ref[0].numpy(), atol=2e-5)
    assert out == out_ref


def test_hard_sigmoid():
    import jax.numpy as jnp
    x = jnp.asarray([-10.0, -2.5, 0.0, 2.5, 10.0])
    np.testing.assert_allclose(np.asarray(hard_sigmoid(x)),
                               [0.0, 0.0, 0.5, 1.0, 1.0])


def test_random_init_predicts():
    s = Shakkala(seed=0)
    out = s.predict("ذهب")
    assert isinstance(out, str) and len(out) >= 3
    s2 = Shakkelha(seed=0)
    out2 = s2.predict("ذهب")
    assert isinstance(out2, str) and out2.startswith("ذ")


def test_list_input():
    s = Shakkelha(seed=0)
    outs = s.predict(["ذهب", "ولد"])
    assert isinstance(outs, list) and len(outs) == 2


def test_empty_list_input():
    for model in (Shakkala(seed=0), Shakkelha(seed=0)):
        assert model.predict([]) == []
        assert model.predict([], return_probs=True) == ([], [])


def test_batched_predict_matches_single():
    """The batched (padded + carry-hold masked) forward must reproduce the
    per-utterance outputs exactly, across mixed lengths crossing the
    32-char bucket boundary."""
    texts = ["ذهب الولد الصغير إلى المدرسة في الصباح الباكر ثم عاد",
             "ولد", "السلام عليكم ورحمة الله", "من"]
    for model in (Shakkala(seed=0), Shakkelha(seed=0)):
        singles = [model.predict(t) for t in texts]
        batched = model.predict(texts)
        assert batched == singles
        _, probs = model.predict(texts, return_probs=True)
        _, p0 = model.predict(texts[1], return_probs=True)
        np.testing.assert_allclose(probs[1], p0, atol=2e-6, rtol=0)
