#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth) into this framework's
pickle checkpoint format, so `inference.py --checkpoint out.pkl` (or
--use_checkpoint resume of the generator) can consume it.

Usage:
  python port_torch_checkpoint.py --input lastCheckpoint_exp.pth \
      --output models/exp_checkpoint.pkl [--discriminator d.pth]
"""

import argparse

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import torch_port
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (
    checkpoint as ckpt_lib,
)


def main(args):
    sd, loaded = torch_port.load_torch_checkpoint(args.input)
    variables = torch_port.generator_from_torch_state(sd)
    payload = {
        "epoch": loaded.get("epoch", 0),
        "state": {
            "g_params": variables["params"],
            "g_stats": variables["batch_stats"],
        },
        "source": args.input,
    }
    if args.discriminator:
        dsd, dloaded = torch_port.load_torch_checkpoint(args.discriminator)
        dvars = torch_port.discriminator_from_torch_state(dsd)
        payload["state"]["d_params"] = dvars["params"]
        payload["state"]["d_stats"] = dvars["batch_stats"]
    ckpt_lib.save_checkpoint(args.output, payload)
    print(f"wrote {args.output} (epoch {payload['epoch']})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="reference generator .pth")
    parser.add_argument("--output", required=True, help="output .pkl path")
    parser.add_argument("--discriminator", default="", help="optional discriminator .pth")
    args = parser.parse_args()
    main(args)
