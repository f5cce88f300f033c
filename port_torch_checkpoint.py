#!/usr/bin/env python
"""Checkpoint interchange with the reference, BOTH directions.

Import (default): a reference PyTorch checkpoint (.pth,
{'epoch','state_dict'} — reference train_gan.py:353-370) becomes this
framework's pickle checkpoint, so `inference.py --checkpoint out.pkl`
(or --use_checkpoint resume of the generator) can consume it.

Export (--reverse): a checkpoint trained HERE becomes a .pth the
reference's own inference.py:34-44 ``model.load_state_dict(...)``
loads unchanged (strict=True key/shape match) — models trained on TPU
drop back into the reference's serving path.

Usage:
  python port_torch_checkpoint.py --input lastCheckpoint_exp.pth \
      --output models/exp_checkpoint.pkl [--discriminator d.pth]
  python port_torch_checkpoint.py --reverse \
      --input models/lastCheckpoint_exp.pkl --output exp.pth
"""

import argparse

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import torch_port
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (
    checkpoint as ckpt_lib,
)


def main(args):
    if args.reverse:
        payload = ckpt_lib.load_checkpoint(args.input)
        state = payload["state"]
        sd = torch_port.generator_to_torch_state(
            {"params": state["g_params"], "batch_stats": state["g_stats"]}
        )
        torch_port.save_torch_checkpoint(
            args.output, sd, epoch=payload.get("epoch", 0)
        )
        print(f"wrote {args.output} ({len(sd)} tensors, "
              f"epoch {payload.get('epoch', 0)})")
        if args.discriminator:
            dsd = torch_port.discriminator_to_torch_state(
                {"params": state["d_params"], "batch_stats": state["d_stats"]}
            )
            torch_port.save_torch_checkpoint(
                args.discriminator, dsd, epoch=payload.get("epoch", 0)
            )
            print(f"wrote {args.discriminator} ({len(dsd)} tensors)")
        return

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
    parser.add_argument("--input", required=True,
                        help="reference generator .pth (or, with "
                        "--reverse, this framework's .pkl checkpoint)")
    parser.add_argument("--output", required=True,
                        help="output .pkl path (or .pth with --reverse)")
    parser.add_argument("--discriminator", default="",
                        help="optional discriminator .pth (with --reverse: "
                        "output path for the exported discriminator .pth)")
    parser.add_argument("--reverse", action="store_true",
                        help="export direction: our .pkl -> reference .pth")
    args = parser.parse_args()
    main(args)
