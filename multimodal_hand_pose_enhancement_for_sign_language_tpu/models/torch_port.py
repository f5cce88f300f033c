"""Convert reference PyTorch checkpoints into this framework's pytrees.

The reference stores checkpoints as
``{'epoch', 'state_dict', 'g_optimizer'|'d_optimizer'}`` (train_gan.py:
353-370) with keys like ``encoder.1.weight`` (nn.Sequential indices:
0 Dropout, 1 Conv1d, 2 LeakyReLU, 3 BatchNorm1d[, 4 MaxPool1d]).

Weight layout conversions:
  * Conv1d      torch (out, in, k)  -> flax (k, in, out)
  * ConvT1d     torch (in, out, k)  -> flax (k, in, out)
  * Linear      torch (out, in)     -> flax (in, out)
  * BatchNorm   weight/bias -> scale/bias; running_mean/var -> batch_stats

Only numpy/pickle are needed to *read* a checkpoint saved with
``torch.save`` if torch is importable; torch (CPU) is used when present.
"""

from __future__ import annotations

import numpy as np

# flax collections are plain nested dicts here
ParamTree = dict


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"])  # (out, in, k)
    b = np.asarray(sd[f"{key}.bias"])
    return {"kernel": np.transpose(w, (2, 1, 0)), "bias": b}


def _convT(sd, key):
    w = np.asarray(sd[f"{key}.weight"])  # (in, out, k)
    b = np.asarray(sd[f"{key}.bias"])
    return {"kernel": np.transpose(w, (2, 0, 1)), "bias": b}


def _dense(sd, key):
    w = np.asarray(sd[f"{key}.weight"])  # (out, in)
    b = np.asarray(sd[f"{key}.bias"])
    return {"kernel": np.transpose(w, (1, 0)), "bias": b}


def _bn(sd, key):
    return (
        {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])},
        {
            "mean": np.asarray(sd[f"{key}.running_mean"]),
            "var": np.asarray(sd[f"{key}.running_var"]),
        },
    )


def _conv_block(sd, key, conv_idx=1, bn_idx=3):
    """Reference Sequential block -> our ConvBlock {Conv1d_0, BatchNorm_0}."""
    params = {"Conv1d_0": _conv(sd, f"{key}.{conv_idx}")}
    bn_p, bn_s = _bn(sd, f"{key}.{bn_idx}")
    params["BatchNorm_0"] = bn_p
    stats = {"BatchNorm_0": bn_s}
    return params, stats


def _feat_block(sd, key):
    """text/image postprocess Sequential -> FeatEmbedBlock."""
    params = {"Dense_0": _dense(sd, f"{key}.1")}
    bn_p, bn_s = _bn(sd, f"{key}.3")
    params["BatchNorm_0"] = bn_p
    stats = {"BatchNorm_0": bn_s}
    return params, stats


def _decoder(sd, key="decoder"):
    """decoder Sequential (indices 1 conv, 3 bn, 5 convT, 7 bn, 9 conv)."""
    cb_p, cb_s = _conv_block(sd, key, 1, 3)
    params = {
        "ConvBlock_0": cb_p,
        "ConvTranspose1d_0": _convT(sd, f"{key}.5"),
        "Conv1d_0": _conv(sd, f"{key}.9"),
    }
    bn_p, bn_s = _bn(sd, f"{key}.7")
    params["BatchNorm_0"] = bn_p
    stats = {"ConvBlock_0": cb_s, "BatchNorm_0": bn_s}
    return params, stats


_GEN_BLOCKS = {
    # block name in both frameworks -> (present-if predicate)
    "encoder": lambda sd: True,
    "conv5": lambda sd: True,
    "conv6": lambda sd: True,
    "conv7": lambda sd: True,
    "conv8": lambda sd: "conv8.1.weight" in sd,
    "conv9": lambda sd: "conv9.1.weight" in sd,
    "conv10": lambda sd: "conv10.1.weight" in sd,
    "skip1": lambda sd: "skip1.1.weight" in sd,
    "skip2": lambda sd: "skip2.1.weight" in sd,
    "skip3": lambda sd: "skip3.1.weight" in sd,
    "skip4": lambda sd: "skip4.1.weight" in sd,
    "skip5": lambda sd: "skip5.1.weight" in sd,
}


def generator_from_torch_state(state_dict) -> dict:
    """torch state_dict -> {'params': ..., 'batch_stats': ...} pytree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    for name, present in _GEN_BLOCKS.items():
        if present(sd):
            p, s = _conv_block(sd, name)
            params[name] = p
            stats[name] = s
    for feat_key in ("text_embeds_postprocess", "image_resnet_postprocess"):
        if f"{feat_key}.1.weight" in sd:
            p, s = _feat_block(sd, feat_key)
            params[feat_key] = p
            stats[feat_key] = s
    p, s = _decoder(sd)
    params["decoder"] = p
    stats["decoder"] = s
    return {"params": params, "batch_stats": stats}


def discriminator_from_torch_state(state_dict) -> dict:
    """torch discriminator state_dict ('convs.<i>.*') -> pytree.

    Sequential layout: 7 x [Dropout, Conv, LReLU, BN] then [Dropout, Conv];
    conv indices 1,5,9,...,25 and final conv at 29.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    for i in range(7):
        conv_idx = 1 + 4 * i
        bn_idx = conv_idx + 2
        p, s = _conv_block(sd, "convs", conv_idx, bn_idx)
        params[f"block{i}"] = p
        stats[f"block{i}"] = s
    params["final"] = _conv(sd, "convs.29")
    return {"params": params, "batch_stats": stats}


_GATES = ("i", "f", "g", "o")  # torch nn.LSTM gate order (W_ii|W_if|W_ig|W_io)


def classifier_from_torch_state(state_dict) -> dict:
    """torch ClassifLSTM state_dict -> flax ClassifLSTM params pytree.

    The reference (H2Sclassifier/Model/ClassifLSTM.py:16-26) is a stacked
    nn.LSTM (optionally bidirectional) + Linear.  Mapping:

      * ``lstm.weight_ih_l{k}[_reverse]`` (4H, in) -> per-gate input
        kernels ``i{i,f,g,o}.kernel`` of cell ``lstm{k}_{f|b}_cell``;
        the kernel's extra LAST row is ``bias_ih`` (the flax model feeds
        a constant-1-augmented input, so torch's dual-bias Adam dynamics
        are preserved elementwise),
      * ``lstm.weight_hh_l{k}[_reverse]`` (4H, H) -> recurrent kernels
        ``h{i,f,g,o}.kernel`` (H, H) with bias ``bias_hh``,
      * ``Linear.weight/bias`` -> the head Dense.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    hidden = sd["lstm.weight_hh_l0"].shape[1]
    params: dict = {}
    layer = 0
    while f"lstm.weight_ih_l{layer}" in sd:
        for suffix, tag in (("", "f"), ("_reverse", "b")):
            key = f"lstm.weight_ih_l{layer}{suffix}"
            if key not in sd:
                continue
            w_ih = sd[key]  # (4H, in)
            w_hh = sd[f"lstm.weight_hh_l{layer}{suffix}"]  # (4H, H)
            b_ih = sd[f"lstm.bias_ih_l{layer}{suffix}"]  # (4H,)
            b_hh = sd[f"lstm.bias_hh_l{layer}{suffix}"]  # (4H,)
            cell: dict = {}
            for gi, gate in enumerate(_GATES):
                sl = slice(gi * hidden, (gi + 1) * hidden)
                cell[f"i{gate}"] = {
                    "kernel": np.concatenate(
                        [np.transpose(w_ih[sl], (1, 0)), b_ih[sl][None, :]], axis=0
                    )
                }
                cell[f"h{gate}"] = {
                    "kernel": np.transpose(w_hh[sl], (1, 0)),
                    "bias": b_hh[sl],
                }
            params[f"lstm{layer}_{tag}_cell"] = cell
        layer += 1
    params["Linear"] = _dense(sd, "Linear")
    return {"params": params}


def sentence_classifier_from_torch_state(state_dict) -> dict:
    """torch SentenceClassifier (MLP_main.py:17-28, Sequential indices
    0 Linear, 2 Linear) -> flax SentenceClassifier params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return {
        "params": {
            "fc1": _dense(sd, "classifier.0"),
            "fc2": _dense(sd, "classifier.2"),
        }
    }


def load_torch_checkpoint(path: str):
    """Load a reference .pth checkpoint (requires torch, CPU map)."""
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    return {k: v.numpy() for k, v in loaded["state_dict"].items()}, loaded


# ---------------------------------------------------------------------------
# Reverse direction: this framework's pytrees -> reference torch state_dicts.
# Exact inverses of the importers above, so checkpoints interchange BOTH ways:
# a model trained here can be loaded by the reference's own
# inference.py:34-44 ``model.load_state_dict(...)`` unchanged.


def _conv_rev(out, block):
    return {
        f"{out}.weight": np.ascontiguousarray(
            np.transpose(np.asarray(block["kernel"]), (2, 1, 0))
        ),  # flax (k, in, out) -> torch (out, in, k)
        f"{out}.bias": np.asarray(block["bias"]),
    }


def _convT_rev(out, block):
    return {
        f"{out}.weight": np.ascontiguousarray(
            np.transpose(np.asarray(block["kernel"]), (1, 2, 0))
        ),  # flax (k, in, out) -> torch (in, out, k)
        f"{out}.bias": np.asarray(block["bias"]),
    }


def _dense_rev(out, block):
    return {
        f"{out}.weight": np.ascontiguousarray(
            np.transpose(np.asarray(block["kernel"]), (1, 0))
        ),
        f"{out}.bias": np.asarray(block["bias"]),
    }


def _bn_rev(out, bn_params, bn_stats):
    # torch BN carries a num_batches_tracked buffer that flax has no
    # analogue for; 0 is correct for eval (running stats are used as-is)
    return {
        f"{out}.weight": np.asarray(bn_params["scale"]),
        f"{out}.bias": np.asarray(bn_params["bias"]),
        f"{out}.running_mean": np.asarray(bn_stats["mean"]),
        f"{out}.running_var": np.asarray(bn_stats["var"]),
        f"{out}.num_batches_tracked": np.asarray(0, dtype=np.int64),
    }


def _conv_block_rev(name, params, stats, conv_idx=1, bn_idx=3):
    sd = _conv_rev(f"{name}.{conv_idx}", params["Conv1d_0"])
    sd.update(
        _bn_rev(f"{name}.{bn_idx}", params["BatchNorm_0"],
                stats["BatchNorm_0"])
    )
    return sd


def generator_to_torch_state(variables) -> dict:
    """{'params', 'batch_stats'} pytree -> reference torch state_dict.

    Inverse of :func:`generator_from_torch_state`; round-trips bitwise
    (the transposes are their own inverses).  Key layout matches the
    reference modelZoo.py Sequential indices, so the produced dict loads
    with ``strict=True``."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    for name in _GEN_BLOCKS:
        if name in params:
            sd.update(_conv_block_rev(name, params[name], stats[name]))
    for feat_key in ("text_embeds_postprocess", "image_resnet_postprocess"):
        if feat_key in params:
            sd.update(_dense_rev(f"{feat_key}.1", params[feat_key]["Dense_0"]))
            sd.update(
                _bn_rev(f"{feat_key}.3", params[feat_key]["BatchNorm_0"],
                        stats[feat_key]["BatchNorm_0"])
            )
    dec_p, dec_s = params["decoder"], stats["decoder"]
    sd.update(_conv_block_rev("decoder", dec_p["ConvBlock_0"],
                              dec_s["ConvBlock_0"], 1, 3))
    sd.update(_convT_rev("decoder.5", dec_p["ConvTranspose1d_0"]))
    sd.update(_bn_rev("decoder.7", dec_p["BatchNorm_0"], dec_s["BatchNorm_0"]))
    sd.update(_conv_rev("decoder.9", dec_p["Conv1d_0"]))
    return sd


def discriminator_to_torch_state(variables) -> dict:
    """Inverse of :func:`discriminator_from_torch_state` (convs.<i> keys)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    for i in range(7):
        conv_idx = 1 + 4 * i
        sd.update(
            _conv_block_rev("convs", params[f"block{i}"], stats[f"block{i}"],
                            conv_idx, conv_idx + 2)
        )
    sd.update(_conv_rev("convs.29", params["final"]))
    return sd


def save_torch_checkpoint(path: str, state_dict: dict, epoch: int = 0):
    """Write a ``.pth`` in the reference's checkpoint shape
    ({'epoch', 'state_dict'}, train_gan.py:353-370) so the reference's
    inference.py:34-44 consumes it unchanged (requires torch)."""
    import torch

    torch.save(
        {
            "epoch": int(epoch),
            "state_dict": {
                k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state_dict.items()
            },
        },
        path,
    )
