"""Helper to import the mounted reference implementation for differential
tests, stubbing its optional heavy deps (numba/torchaudio/librosa) that are
absent in this environment."""
import sys
import types


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference(reference_dir="/root/reference"):
    """Make reference packages importable; returns the path inserted."""
    if "numba" not in sys.modules:
        numba = _stub("numba")
        numba.jit = lambda *a, **k: (
            a[0] if a and callable(a[0]) else (lambda f: f))
        numba.njit = numba.jit
        numba.prange = range
    if "torchaudio" not in sys.modules:
        ta = _stub("torchaudio")
        ta.transforms = _stub("torchaudio.transforms")
        ta.functional = _stub("torchaudio.functional")
        ta.models = _stub("torchaudio.models")
        import torch as _t
        taff = _stub("torchaudio.functional.functional")
        taff._hz_to_mel = lambda f, mel_scale="htk": (
            2595.0 * _t.log10(_t.as_tensor(1.0 + f / 700.0)))
        taff._mel_to_hz = lambda m, mel_scale="htk": 700.0 * (
            10.0 ** (_t.as_tensor(m) / 2595.0) - 1.0)
        ta.functional.functional = taff
    if "librosa" not in sys.modules:
        lb = _stub("librosa")
        lb.filters = _stub("librosa.filters")
    if "huggingface_hub" not in sys.modules:
        hh = _stub("huggingface_hub")
        hh.hf_hub_download = lambda *a, **k: None
    # torchaudio MelSpectrogram stub good enough for MelVocos.__init__
    import types as _types
    ta = sys.modules.get("torchaudio")
    if ta is not None and not hasattr(ta.transforms, "MelSpectrogram"):
        import torch as _torch

        class _FakeMelSpectrogram(_torch.nn.Module):
            def __init__(self, **kw):
                super().__init__()
                self.win_length = kw.get("n_fft", 1024)
                self.hop_length = kw.get("hop_length", 256)

        ta.transforms.MelSpectrogram = _FakeMelSpectrogram
    path = str(reference_dir)
    if path not in sys.path:
        sys.path.insert(0, path)
    return path
