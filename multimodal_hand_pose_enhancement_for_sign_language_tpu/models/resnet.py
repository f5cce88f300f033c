"""ResNet-50 in flax (NHWC) for hand-crop feature extraction.

TPU-native replacement for the torchvision ResNet-50 used by the video
featurizer (reference proc_vid.py:178-203, local weights
models/resnet50-0676ba61.pth).  Matches torchvision's architecture
exactly so its weights convert one-to-one via
`from_torchvision_state`; eval-mode outputs then agree to float tolerance.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_STAGES = ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        identity = x
        out = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(
            self.width,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            name="conv2",
        )(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(self.width * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.width * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for si, (width, blocks, stride) in enumerate(_STAGES):
            for bi in range(blocks):
                x = Bottleneck(
                    width,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    name=f"layer{si + 1}_{bi}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)


def _conv_w(t):  # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def from_torchvision_state(state_dict) -> dict:
    """torchvision resnet50 state_dict -> flax variables."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {"conv1": {"kernel": _conv_w(sd["conv1.weight"])}}
    stats: dict = {}

    def bn(prefix):
        return (
            {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
        )

    p, s = bn("bn1")
    params["bn1"], stats["bn1"] = p, s
    for si, (width, blocks, stride) in enumerate(_STAGES):
        for bi in range(blocks):
            t = f"layer{si + 1}.{bi}"
            f = f"layer{si + 1}_{bi}"
            bp: dict = {}
            bs: dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv_w(sd[f"{t}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = bn(f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv_w(sd[f"{t}.downsample.0.weight"])
                }
                bp["downsample_bn"], bs["downsample_bn"] = bn(f"{t}.downsample.1")
            params[f] = bp
            stats[f] = bs
    params["fc"] = {
        "kernel": np.transpose(sd["fc.weight"], (1, 0)),
        "bias": sd["fc.bias"],
    }
    return {"params": params, "batch_stats": stats}


def load_variables(model: ResNet50, weights_path: Optional[str] = None):
    """Variables from a torchvision .pth if given/available, else random."""
    import jax

    if weights_path and weights_path.endswith(".pth"):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        return from_torchvision_state(sd)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 120, 120, 3)), False)
