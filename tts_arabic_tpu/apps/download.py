"""Pretrained-artifact downloader + verifier (reference `download_files.py`
equivalent, `/root/reference/download_files.py:7-53`).

    python -m tts_arabic_tpu.apps.download [--all | names...]
    python -m tts_arabic_tpu.apps.download --verify

Fetches the reference project's released checkpoints (Google Drive URLs
from the reference manifest) into `pretrained/`, then they can be loaded
directly — our pipelines import reference `.pth` files natively
(models/torch_import.py).

`--verify` is the real-artifact quality gate (VERDICT r2 #6): for each
artifact it (a) fetches it if missing and a fetcher is available, (b) runs
the matching importer and synthesizes one sentence / forward pass through
the real weights, and (c) reports OK/FAIL plus the file's sha256 prefix.
Offline (no gdown, no network) it skips missing files cleanly and exits 0;
any verification FAILURE of a present file exits 1.
"""
from __future__ import annotations

import argparse
import hashlib
import pathlib
import sys

# Artifact manifest mirroring the reference downloader's targets
# (names, relative paths, and Drive URLs must match the published set).
FILES = {
    "tacotron2_ar_mse.pth": {
        "path": "pretrained/tacotron2_ar_mse.pth",
        "url": "https://drive.google.com/file/d/"
               "1GCu-ZAcfJuT5qfzlKItcNqtuVNa7CNy9/view?usp=sharing",
        "kind": "tacotron2 (MSE)", "verify": "tacotron2"},
    "tacotron2_ar_adv.pth": {
        "path": "pretrained/tacotron2_ar_adv.pth",
        "url": "https://drive.google.com/file/d/"
               "1FusCFZIXSVCQ9Q6PLb91GIkEnhn_zWRS/view?usp=sharing",
        "kind": "tacotron2 (adversarial)", "verify": "tacotron2"},
    "fastpitch_ar_mse.pth": {
        "path": "pretrained/fastpitch_ar_mse.pth",
        "url": "https://drive.google.com/file/d/"
               "1sliRc62wjPTnPWBVQ95NDUgnCSH5E8M0/view?usp=sharing",
        "kind": "fastpitch (MSE)", "verify": "fastpitch"},
    "fastpitch_ar_adv.pth": {
        "path": "pretrained/fastpitch_ar_adv.pth",
        "url": "https://drive.google.com/file/d/"
               "1-vZOhi9To_78-yRslC6sFLJBUjwgJT-D/view?usp=sharing",
        "kind": "fastpitch (adversarial)", "verify": "fastpitch"},
    "fastpitch_ar_ms.pth": {
        "path": "pretrained/fastpitch_ar_ms.pth",
        "url": "https://drive.google.com/file/d/"
               "18IYUSRXvLErVjaDORj_TKzUxs90l61Ja/view?usp=sharing",
        "kind": "fastpitch (multispeaker)", "verify": "fastpitch_ms"},
    "hifigan-asc.pth": {
        "path": "pretrained/hifigan-asc-v1/hifigan-asc.pth",
        "url": "https://drive.google.com/file/d/"
               "1zSYYnJFS-gQox-IeI71hVY-fdPysxuFK/view?usp=sharing",
        "kind": "HiFi-GAN vocoder", "verify": "hifigan"},
    "shakkelha_rnn_3_big_20.pth": {
        "path": "pretrained/diacritizers/shakkelha_rnn_3_big_20.pth",
        "url": "https://drive.google.com/file/d/"
               "1CbDjbuBr-798x88vjLGtMPSB2Y1KwD68/view?usp=sharing",
        "kind": "Shakkelha diacritizer", "verify": "shakkelha"},
    "shakkala_second_model6.pth": {
        "path": "pretrained/diacritizers/shakkala_second_model6.pth",
        "url": "https://drive.google.com/file/d/"
               "1hgMGqXLTc58Gq_bN7WpuBWscBxX-rXXd/view?usp=sharing",
        "kind": "Shakkala diacritizer", "verify": "shakkala"},
}

TEST_PHONEMES = "b a m a k a"  # one-sentence smoke input (Buckwalter phons)


def default_fetcher():
    """gdown-backed fetcher, or None when gdown isn't installed."""
    try:
        import gdown
    except ImportError:
        return None

    def fetch(url: str, dest: pathlib.Path):
        dest.parent.mkdir(parents=True, exist_ok=True)
        gdown.download(url=url, output=str(dest), fuzzy=True, quiet=True)

    return fetch


def sha256_prefix(path: pathlib.Path, n=12) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()[:n]


def verify_artifact(name: str, path: pathlib.Path) -> tuple[bool, str]:
    """Load the artifact through its importer and run one synthesis /
    forward pass. Returns (ok, detail)."""
    import numpy as np

    kind = FILES[name]["verify"]
    try:
        if kind in ("fastpitch", "fastpitch_ms"):
            from ..infer import FastPitchTTS
            tts = FastPitchTTS(checkpoint=path, arabic_in=False)
            sid = tts.config.n_speakers - 1 if kind == "fastpitch_ms" else 0
            mel = tts.ttmel(TEST_PHONEMES, speaker_id=sid)
            assert mel.shape[0] == 80 and np.isfinite(mel).all()
            detail = f"mel {mel.shape[0]}x{mel.shape[1]}"
        elif kind == "tacotron2":
            from ..infer import Tacotron2TTS
            tts = Tacotron2TTS(checkpoint=path, arabic_in=False,
                               decoder_max_step=128)
            mel = tts.ttmel(TEST_PHONEMES, postprocess_mel=False)
            assert mel.shape[0] == 80 and np.isfinite(mel).all()
            detail = f"mel {mel.shape[0]}x{mel.shape[1]}"
        elif kind == "hifigan":
            import jax.numpy as jnp
            from ..models.torch_import import hifigan_params_from_torch
            from ..runtime.checkpoint import load_torch_state_dict
            from ..vocoder.hifigan import Generator, HiFiGANConfig
            sib = path.parent / "config.json"
            cfg = (HiFiGANConfig.from_json(sib) if sib.is_file()
                   else HiFiGANConfig())
            sd = load_torch_state_dict(path)
            sd.pop("__extras__", None)
            variables = hifigan_params_from_torch(sd, cfg)
            mel = jnp.full((1, 16, cfg.num_mels), float(np.log(1e-5)))
            wave = Generator(cfg).apply(variables, mel)
            assert np.isfinite(np.asarray(wave)).all()
            detail = f"wave {wave.shape[1]} samples"
        elif kind == "shakkala":
            from ..diacritizers import Shakkala
            out = Shakkala(sd_path=str(path)).predict("كتب")
            assert isinstance(out, str) and len(out) >= 3
            detail = f"diacritized {len(out)} chars"
        elif kind == "shakkelha":
            from ..diacritizers import Shakkelha
            out = Shakkelha(sd_path=str(path)).predict("كتب")
            assert isinstance(out, str) and len(out) >= 3
            detail = f"diacritized {len(out)} chars"
        else:  # pragma: no cover - manifest and dispatch are in sync
            return False, f"no verifier for kind {kind!r}"
    except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
        return False, f"{type(e).__name__}: {e}"
    return True, f"{detail}, sha256 {sha256_prefix(path)}"


_USE_DEFAULT = object()


def run_verify(root: pathlib.Path, names, fetcher=_USE_DEFAULT,
               out=print) -> int:
    """Fetch-if-possible then verify each artifact; returns exit code.
    `fetcher=None` forces offline mode (tests); the default resolves to
    gdown when installed."""
    if fetcher is _USE_DEFAULT:
        fetcher = default_fetcher()
    failures = 0
    out(f"{'name':32s} {'status':8s} detail")
    for name in names:
        info = FILES[name]
        path = root / info["path"]
        if not path.is_file() and fetcher is not None:
            try:
                fetcher(info["url"], path)
            except Exception as e:  # noqa: BLE001
                out(f"{name:32s} {'FAIL':8s} fetch error: {e}")
                failures += 1
                continue
        if not path.is_file():
            out(f"{name:32s} {'skipped':8s} not present, no fetcher "
                "(offline)")
            continue
        ok, detail = verify_artifact(name, path)
        out(f"{name:32s} {'OK' if ok else 'FAIL':8s} {detail}")
        failures += 0 if ok else 1
    return 1 if failures else 0


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("names", nargs="*", help="subset of files to fetch")
    parser.add_argument("--dest", default=".",
                        help="project root (artifacts land under "
                             "<dest>/pretrained/)")
    parser.add_argument("--verify", action="store_true",
                        help="fetch if possible, then load each artifact "
                             "through its importer and synthesize one "
                             "sentence; reports OK/hash per artifact")
    args = parser.parse_args(argv)

    targets = args.names or list(FILES)
    unknown = [n for n in targets if n not in FILES]
    if unknown:
        print(f"unknown artifact names: {unknown}", file=sys.stderr)
        return 2
    root = pathlib.Path(args.dest)

    if args.verify:
        return run_verify(root, targets)

    fetcher = default_fetcher()
    print(f"{'name':32s} {'status':10s} kind")
    for name in targets:
        info = FILES[name]
        path = root / info["path"]
        if path.is_file():
            status = "present"
        elif fetcher is not None:
            try:
                fetcher(info["url"], path)
                status = "fetched" if path.is_file() else "fetch-failed"
            except Exception:  # noqa: BLE001
                status = "fetch-failed"
        else:
            status = "missing"
        print(f"{name:32s} {status:10s} {info['kind']}")
    if fetcher is None:
        print("\ngdown is not installed in this environment; place the "
              "reference project's released checkpoints under pretrained/ "
              "manually — the loaders read them directly. Run with "
              "--verify once they are in place.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
