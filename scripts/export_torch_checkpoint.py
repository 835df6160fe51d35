"""Export a framework checkpoint to the reference's torch `.pth` format.

Closes the interop loop: reference checkpoints already resume on TPU
(utils/torch_import.py, every CLI); this writes the other direction — a
`*_gen.pth` the UNMODIFIED reference loads with strict=True
(/root/reference/model/model.py:153-173) for all four model families.

Usage:
  python scripts/export_torch_checkpoint.py -c configs/splitting_hagen_indi_joint.json \
      --resume <ckpt_prefix> -o exported/I10000_E5 [--ema]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--resume", required=True,
                    help="checkpoint prefix (…/I{it}_E{ep})")
    ap.add_argument("-o", "--out", required=True,
                    help="output path (appends _gen.pth when no .pth suffix)")
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA weights instead of the raw params")
    args = ap.parse_args(argv)

    from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
    from diffsplitting_tpu.train import DiffusionModel

    opt = load_json(args.config)
    opt["phase"] = "val"
    opt["path"]["resume_state"] = args.resume
    opt = dict_to_nonedict(opt)

    model = DiffusionModel(opt)
    if args.ema and model.ema_params is None:
        raise SystemExit("--ema requested but the checkpoint carries no EMA state")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    out = model.export_torch(args.out, use_ema=args.ema)
    print("wrote", out, flush=True)
    return out


if __name__ == "__main__":
    main()
