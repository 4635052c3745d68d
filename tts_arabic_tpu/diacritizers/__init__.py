"""Diacritizers (vowelizers): unvocalized Arabic -> fully vowelized Arabic.

Two LSTM diacritizers with capability parity to the reference
(`models/diacritizers/`): Shakkala (hard-sigmoid-gate BiLSTM stack,
`shakkala/network.py:8-77` + `lstm_hsm.py:352-379`) and Shakkelha (standard
BiLSTM stack, `shakkelha/network.py:9-80`). Character vocabularies are
carried as JSON data files (`vocab_*.json`) because they index the
pretrained checkpoints' embeddings.
"""
from .models import Shakkala, Shakkelha, load_vowelizer

__all__ = ["Shakkala", "Shakkelha", "load_vowelizer"]
