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
    if "librosa" not in sys.modules:
        lb = _stub("librosa")
        lb.filters = _stub("librosa.filters")
    path = str(reference_dir)
    if path not in sys.path:
        sys.path.insert(0, path)
    return path
