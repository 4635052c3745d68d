"""Independent torch oracle for the Tacotron2 differential test.

torchaudio is not installed in this environment, so the reference's
`Tacotron2MS` (which imports `torchaudio.models.tacotron2._Encoder/_Decoder/
_Postnet` at `models/tacotron2/tacotron2_ms.py:113`) cannot be run. This
module re-creates that exact structure from plain torch primitives
(`nn.LSTM`, `nn.LSTMCell`, `nn.Conv1d`), with a state_dict whose key names
match torchaudio's layout byte-for-byte — the same keys
`tacotron2_params_from_torch` consumes — and an `infer()` that follows
torchaudio `_Decoder.infer`'s step semantics (go frame, attention-LSTM →
location-sensitive attention → decoder-LSTM → projection/gate, per-sample
length bookkeeping, gate-threshold early stop).

Prenet dropout (hardcoded training=True in torchaudio) is omitted so decode
is deterministic; compare against our model with `prenet_dropout=0`.
"""
import torch
import torch.nn.functional as F
from torch import nn


class _ConvNorm(nn.Module):
    def __init__(self, cin, cout, k, bias=True):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, k, padding=(k - 1) // 2, bias=bias)

    def forward(self, x):
        return self.conv(x)


class _LinearNorm(nn.Module):
    def __init__(self, cin, cout, bias=True):
        super().__init__()
        self.linear_layer = nn.Linear(cin, cout, bias=bias)

    def forward(self, x):
        return self.linear_layer(x)


class _LocationLayer(nn.Module):
    def __init__(self, n_filters, kernel_size, attn_dim):
        super().__init__()
        self.location_conv = _ConvNorm(2, n_filters, kernel_size, bias=False)
        self.location_dense = _LinearNorm(n_filters, attn_dim, bias=False)

    def forward(self, attn_weights_cat):  # [B, 2, T]
        x = self.location_conv(attn_weights_cat)        # [B, F, T]
        return self.location_dense(x.transpose(1, 2))   # [B, T, attn_dim]


class _Attention(nn.Module):
    def __init__(self, rnn_dim, memory_dim, attn_dim, n_filters, kernel):
        super().__init__()
        self.query_layer = _LinearNorm(rnn_dim, attn_dim, bias=False)
        self.memory_layer = _LinearNorm(memory_dim, attn_dim, bias=False)
        self.v = _LinearNorm(attn_dim, 1, bias=False)
        self.location_layer = _LocationLayer(n_filters, kernel, attn_dim)

    def forward(self, query, memory, processed_memory, attn_weights_cat,
                mask):
        processed = (self.query_layer(query.unsqueeze(1))
                     + self.location_layer(attn_weights_cat)
                     + processed_memory)
        energies = self.v(torch.tanh(processed)).squeeze(-1)   # [B, T]
        energies = energies.masked_fill(mask, float("-inf"))
        weights = F.softmax(energies, dim=1)
        context = torch.bmm(weights.unsqueeze(1), memory).squeeze(1)
        return context, weights


class _Prenet(nn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.layers = nn.ModuleList(
            [_LinearNorm(cin, dim, bias=False),
             _LinearNorm(dim, dim, bias=False)])

    def forward(self, x):  # deterministic: torchaudio's always-on dropout
        for lin in self.layers:  # is intentionally omitted
            x = F.relu(lin(x))
        return x


class _Encoder(nn.Module):
    def __init__(self, dim, n_conv, kernel):
        super().__init__()
        self.convolutions = nn.ModuleList([
            nn.Sequential(_ConvNorm(dim, dim, kernel),
                          nn.BatchNorm1d(dim))
            for _ in range(n_conv)
        ])
        self.lstm = nn.LSTM(dim, dim // 2, batch_first=True,
                            bidirectional=True)

    def forward(self, x, lengths):  # x [B, C, T]
        for conv in self.convolutions:
            x = F.relu(conv(x))  # eval: no dropout
        x = x.transpose(1, 2)
        packed = nn.utils.rnn.pack_padded_sequence(
            x, lengths.cpu(), batch_first=True, enforce_sorted=False)
        out, _ = self.lstm(packed)
        out, _ = nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
        return out


class _Decoder(nn.Module):
    def __init__(self, n_mels, memory_dim, rnn_dim, attn_rnn_dim, attn_dim,
                 n_filters, kernel, prenet_dim, max_step, gate_threshold):
        super().__init__()
        self.n_mels, self.memory_dim = n_mels, memory_dim
        self.rnn_dim, self.attn_rnn_dim = rnn_dim, attn_rnn_dim
        self.max_step, self.gate_threshold = max_step, gate_threshold
        self.prenet = _Prenet(n_mels, prenet_dim)
        self.attention_rnn = nn.LSTMCell(prenet_dim + memory_dim,
                                         attn_rnn_dim)
        self.attention_layer = _Attention(attn_rnn_dim, memory_dim, attn_dim,
                                          n_filters, kernel)
        self.decoder_rnn = nn.LSTMCell(attn_rnn_dim + memory_dim, rnn_dim)
        self.linear_projection = _LinearNorm(rnn_dim + memory_dim, n_mels)
        self.gate_layer = _LinearNorm(rnn_dim + memory_dim, 1)

    def infer(self, memory, memory_lengths):
        B, T, _ = memory.shape
        device, dtype = memory.device, memory.dtype
        mask = (torch.arange(T, device=device)[None, :]
                >= memory_lengths[:, None])
        processed_memory = self.attention_layer.memory_layer(memory)

        attn_h = memory.new_zeros(B, self.attn_rnn_dim)
        attn_c = memory.new_zeros(B, self.attn_rnn_dim)
        dec_h = memory.new_zeros(B, self.rnn_dim)
        dec_c = memory.new_zeros(B, self.rnn_dim)
        attn_w = memory.new_zeros(B, T)
        attn_w_cum = memory.new_zeros(B, T)
        context = memory.new_zeros(B, self.memory_dim)
        frame = memory.new_zeros(B, self.n_mels)

        lengths = torch.zeros(B, dtype=torch.int32, device=device)
        finished = torch.zeros(B, dtype=torch.bool, device=device)
        mels, gates, aligns = [], [], []
        for _ in range(self.max_step):
            pre = self.prenet(frame)
            cell_in = torch.cat((pre, context), -1)
            attn_h, attn_c = self.attention_rnn(cell_in, (attn_h, attn_c))
            attn_cat = torch.cat(
                (attn_w.unsqueeze(1), attn_w_cum.unsqueeze(1)), dim=1)
            context, attn_w = self.attention_layer(
                attn_h, memory, processed_memory, attn_cat, mask)
            attn_w_cum = attn_w_cum + attn_w
            dec_in = torch.cat((attn_h, context), -1)
            dec_h, dec_c = self.decoder_rnn(dec_in, (dec_h, dec_c))
            dhc = torch.cat((dec_h, context), dim=1)
            frame = self.linear_projection(dhc)
            gate = self.gate_layer(dhc).squeeze(1)

            mels.append(frame)
            gates.append(gate)
            aligns.append(attn_w)
            lengths = lengths + (~finished).to(torch.int32)
            finished = finished | (torch.sigmoid(gate) > self.gate_threshold)
            if bool(torch.all(finished)):
                break
        return (torch.stack(mels, dim=2),        # [B, n_mels, T_dec]
                lengths,
                torch.stack(aligns, dim=1))      # [B, T_dec, T_txt]


class _Postnet(nn.Module):
    def __init__(self, n_mels, dim, kernel, n_conv):
        super().__init__()
        dims = [dim] * (n_conv - 1) + [n_mels]
        ins = [n_mels] + dims[:-1]
        self.convolutions = nn.ModuleList([
            nn.Sequential(_ConvNorm(i, o, kernel), nn.BatchNorm1d(o))
            for i, o in zip(ins, dims)
        ])

    def forward(self, x):  # [B, n_mels, T]
        n = len(self.convolutions)
        for i, conv in enumerate(self.convolutions):
            x = conv(x)
            if i < n - 1:
                x = torch.tanh(x)
        return x


class Tacotron2Oracle(nn.Module):
    """State-dict-compatible stand-in for the reference `Tacotron2MS`."""

    def __init__(self, n_symbol=40, num_speakers=1, speaker_embedding_dim=128,
                 symbol_embedding_dim=512, encoder_embedding_dim=512,
                 encoder_n_convolution=3, encoder_kernel_size=5,
                 decoder_rnn_dim=1024, decoder_max_step=2000,
                 attention_rnn_dim=1024, attention_hidden_dim=128,
                 attention_location_n_filter=32,
                 attention_location_kernel_size=31, prenet_dim=256,
                 postnet_n_convolution=5, postnet_kernel_size=5,
                 postnet_embedding_dim=512, gate_threshold=0.5, n_mels=80):
        super().__init__()
        self.embedding = nn.Embedding(n_symbol, symbol_embedding_dim)
        self.encoder = _Encoder(encoder_embedding_dim, encoder_n_convolution,
                                encoder_kernel_size)
        memory_dim = encoder_embedding_dim + (
            speaker_embedding_dim if num_speakers > 1 else 0)
        self.decoder = _Decoder(
            n_mels, memory_dim, decoder_rnn_dim, attention_rnn_dim,
            attention_hidden_dim, attention_location_n_filter,
            attention_location_kernel_size, prenet_dim, decoder_max_step,
            gate_threshold)
        self.postnet = _Postnet(n_mels, postnet_embedding_dim,
                                postnet_kernel_size, postnet_n_convolution)
        self.speaker_embedding = (
            nn.Embedding(num_speakers, speaker_embedding_dim)
            if num_speakers > 1 else None)

    @torch.no_grad()
    def infer(self, tokens, speaker_ids=None, lengths=None):
        B, T = tokens.shape
        if lengths is None:
            lengths = torch.full((B,), T, dtype=torch.long)
        emb = self.embedding(tokens).transpose(1, 2)
        memory = self.encoder(emb, lengths)
        if self.speaker_embedding is not None:
            if speaker_ids is None:
                speaker_ids = torch.zeros(B, dtype=torch.long)
            spk = self.speaker_embedding(speaker_ids).unsqueeze(1)
            memory = torch.cat(
                (memory, spk.repeat(1, memory.size(1), 1)), dim=2)
        mel, mel_lengths, aligns = self.decoder.infer(memory, lengths)
        mel_post = mel + self.postnet(mel)
        return mel_post, mel_lengths, aligns
