"""Export a trained checkpoint back to a reference-format `.pth`.

    python -m tts_arabic_tpu.apps.export_torch --model fastpitch \\
        --checkpoint checkpoints/exp_fp_adv/states.ckpt --out fastpitch_ft.pth
    python -m tts_arabic_tpu.apps.export_torch --model tacotron2 ...
    python -m tts_arabic_tpu.apps.export_torch --model hifigan \\
        --checkpoint checkpoints/exp_hifigan_ft/states.ckpt --out hifigan.pth

Checkpoint interchange is bidirectional: the emitted files load straight
into the reference implementation — FastPitch/Tacotron2 wrappers read the
embedded `config` + `symbols` (`models/fastpitch/networks.py:52-60`,
`models/tacotron2/networks.py:96-98`) and `load_hifigan` gets the
weight-normed `{'generator': ...}` layout it removes the norm from
(`vocoder/__init__.py:3-20`). Layout inversions live in
`models/torch_export.py` (round-trip + strict-load tested)."""
from __future__ import annotations

import argparse
import dataclasses

from ..runtime.checkpoint import load_states

# our Tacotron2Config field -> reference Tacotron2MS kwarg
# (tacotron2_ms.py:152-180; names differ only in pluralization)
_T2_REF_KEYS = {
    "n_symbols": "n_symbol",
    "encoder_n_convolutions": "encoder_n_convolution",
    "attention_location_n_filters": "attention_location_n_filter",
    "postnet_n_convolutions": "postnet_n_convolution",
}
_T2_SKIP = {"prenet_dropout"}  # ours-only differential-testing knob


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=["fastpitch", "tacotron2", "hifigan"])
    p.add_argument("--checkpoint", required=True,
                   help="our states.ckpt (training) checkpoint")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--weight-norm-layout", default="legacy",
                   choices=["legacy", "parametrizations"],
                   help="hifigan only: weight_g/weight_v (published "
                        "artifact) or modern parametrizations keys")
    a = p.parse_args(argv)

    from ..models import torch_export as tx
    from ..text import symbols

    st = load_states(a.checkpoint)
    net_config = (st.get("config") or {}).get("net_config") or {}

    if a.model == "fastpitch":
        from ..models.fastpitch import FastPitchConfig
        config = FastPitchConfig(**{
            k: v for k, v in net_config.items()
            if k in FastPitchConfig.__dataclass_fields__})
        sd = tx.fastpitch_params_to_torch({"params": st["model"]}, config)
        tx.save_reference_checkpoint(
            a.out, sd, config=config.to_reference_net_config(),
            symbols=symbols)
    elif a.model == "tacotron2":
        from ..models.tacotron2 import Tacotron2Config
        config = Tacotron2Config(**{
            k: v for k, v in net_config.items()
            if k in Tacotron2Config.__dataclass_fields__})
        variables = {"params": st["model"],
                     "batch_stats": st.get("batch_stats") or {}}
        sd = tx.tacotron2_params_to_torch(variables, config)
        ref_cfg = {_T2_REF_KEYS.get(k, k): v
                   for k, v in dataclasses.asdict(config).items()
                   if k not in _T2_SKIP}
        tx.save_reference_checkpoint(a.out, sd, config=ref_cfg,
                                     symbols=symbols)
    else:
        from ..vocoder.hifigan import HiFiGANConfig
        config = HiFiGANConfig(**{
            k: (tuple(tuple(x) if isinstance(x, (list, tuple)) else x
                      for x in v) if isinstance(v, (list, tuple)) else v)
            for k, v in net_config.items()
            if k in HiFiGANConfig.__dataclass_fields__})
        sd = tx.hifigan_params_to_torch({"params": st["model"]}, config,
                                        layout=a.weight_norm_layout)
        tx.save_reference_checkpoint(a.out, sd, key="generator")
    print(f"exported {a.model} -> {a.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
