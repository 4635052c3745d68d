"""Text frontend golden tests.

The aligned corpus triplets `data/{train,test}_{arab,buckw,phon}.txt` are the
oracle (SURVEY.md §4): the same line in all three files gives
arabic -> buckwalter -> phonemes pairs produced by the reference
implementation.
"""
import pathlib
import re

import pytest

from tts_arabic_tpu.text import (
    EOS, NUM_SYMBOLS, PAD, SEPARATOR, SYMBOL_TO_ID, arabic_to_buckwalter,
    arabic_to_tokens, buckwalter_to_arabic, buckwalter_to_tokens,
    phonemes_to_tokens, process_utterance, simplify_phonemes, symbols,
    tokens_to_ids,
)

DATA = pathlib.Path(__file__).resolve().parents[1] / "data"
_LABEL = re.compile(r'"[^"]+"\s+"(?P<text>[^"]+)"')


def _load(name):
    return [
        m.group("text") if (m := _LABEL.match(line)) else line
        for line in (DATA / name).read_text().splitlines()
    ]


def _triplets(split):
    return list(zip(_load(f"{split}_arab.txt"), _load(f"{split}_buckw.txt"),
                    _load(f"{split}_phon.txt")))


# The corpus phon files were generated before trailing-punctuation handling
# was added upstream; the current reference code (and ours) keeps a detached
# trailing '.' attached to the final word. Only one train line is affected.
KNOWN_CORPUS_DRIFT = {
    "waAlomuHaAfaZapu EalaY Aloqadori AlokaAfiy mina Aln~awomi."
}


@pytest.mark.parametrize("split", ["test", "train"])
def test_transliteration_roundtrip_corpus(split):
    for arab, buckw, _ in _triplets(split):
        assert arabic_to_buckwalter(arab) == buckw
        assert buckwalter_to_arabic(buckw) == arab


@pytest.mark.parametrize("split", ["test", "train"])
def test_g2p_golden_corpus(split):
    bad = []
    for _, buckw, phon in _triplets(split):
        if buckw in KNOWN_CORPUS_DRIFT:
            assert process_utterance(buckw).startswith(phon)
            continue
        got = process_utterance(buckw)
        if got != phon:
            bad.append((buckw, got, phon))
    assert not bad, f"{len(bad)} mismatches; first: {bad[0]}"


def test_symbol_inventory():
    assert NUM_SYMBOLS == 40
    assert symbols[0] == PAD and SYMBOL_TO_ID[PAD] == 0
    assert symbols[1] == EOS
    assert len(set(symbols)) == 40


def test_tokenizer_specials_and_doubling():
    toks = phonemes_to_tokens("b aa rr a")
    # geminate rr -> r + _dbl_; separator + eos appended
    assert toks == ["b", "aa", "r", "_dbl_", "a", SEPARATOR, EOS]
    assert phonemes_to_tokens("b a", append_space=False)[-1] == EOS
    ids = tokens_to_ids(toks)
    assert all(0 <= i < NUM_SYMBOLS for i in ids)


def test_tokenizer_vowel_collapse():
    toks = phonemes_to_tokens("UU0 ii1 A u1 II0")
    assert toks[:5] == ["uu", "ii", "a", "u", "ii"]


def test_tokenizer_strips_silence():
    assert phonemes_to_tokens("sil + b a + sil")[0] == SEPARATOR


def test_simplify_phonemes():
    assert simplify_phonemes("T A r ii0 q I0") == "T a r ii q i"


def test_end_to_end_token_ids_in_range():
    for _, buckw, _ in _triplets("test"):
        ids = tokens_to_ids(buckwalter_to_tokens(buckw))
        assert all(0 <= i < NUM_SYMBOLS for i in ids)


def test_arabic_matches_buckwalter_path():
    for arab, buckw, _ in _triplets("test")[:20]:
        assert arabic_to_tokens(arab) == buckwalter_to_tokens(buckw)


def test_fixed_words():
    assert process_utterance("h*A") == "h aa * aa"
    assert process_utterance("Allhu") == "ll AA h u0"


def test_silence_and_punctuation_words():
    assert process_utterance("sil b - b") == "sil + b + sil + b"
    out = process_utterance("bi.")
    assert out.endswith(" .")


def test_parity_with_reference_implementation(reference_dir):
    """Direct differential test vs the mounted reference implementation."""
    import sys
    sys.path.insert(0, str(reference_dir))
    try:
        from text.phonetise_buckwalter import process_utterance as ref_pu
    finally:
        sys.path.pop(0)
    import random
    random.seed(1234)
    alphabet = list("btTmrZn^zEhjsgHqfxS$dDk>'}&<|AYpywl") + \
        list("aui~oFNK") + [" ", ".", ",", "-"]
    for _ in range(2000):
        s = "".join(random.choice(alphabet)
                    for _ in range(random.randint(1, 16)))
        assert process_utterance(s) == ref_pu(s), repr(s)


def test_sanitize_tokens_and_nonstrict_ids():
    """Graceful tokenization (VERDICT r3 #5): unknown tokens drop,
    separator runs collapse, leading separator drops; identity on clean
    sequences. strict tokens_to_ids keeps the reference KeyError."""
    from tts_arabic_tpu.text import sanitize_tokens, tokens_to_ids

    clean = ["k", "ii", "f", "_+_", "H", "aa", "l", "k", "_eos_"]
    assert sanitize_tokens(clean) == clean

    dirty = ["_+_", "m", "r", ".", "_+_", "_+_", "b", "?", "_eos_"]
    assert sanitize_tokens(dirty) == ["m", "r", "_+_", "b", "_eos_"]
    assert tokens_to_ids(dirty, strict=False) == tokens_to_ids(
        ["m", "r", "_+_", "b", "_eos_"])

    import pytest
    with pytest.raises(KeyError):
        tokens_to_ids(dirty)
