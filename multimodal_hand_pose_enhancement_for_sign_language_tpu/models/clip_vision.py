"""JAX-native CLIP vision tower (ViT-B/32 image encoder).

TPU-native replacement for the torch/clip image featurizer
(/root/reference/proc_vid.py:111-142, `encode_image`): patch conv +
class token + learned positions, pre-LN transformer (reuses
``text_encoders.CLIPLayer``), post-LN CLS pooling and a bias-free visual
projection — HF ``CLIPVisionModelWithProjection`` semantics, converted
one-to-one from torch state_dicts.

The patch conv is a single big matmul on the MXU ((img/patch)^2 patches
x 3*patch^2 -> width); everything downstream is the same batched
attention stack as the text tower.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.text_encoders import (
    PRECISION,
    CLIPLayer,
    _dense_p,
    _ln_p,
)

# openai CLIP preprocessing constants (Normalize in clip.load's transform)
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionEncoder(nn.Module):
    """CLIP's image tower incl. the visual projection (encode_image)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512
    eps: float = 1e-5

    @nn.compact
    def __call__(self, pixels, return_hidden: bool = False):
        """pixels: (B, H, W, 3) NHWC, already resized + CLIP-normalized."""
        B = pixels.shape[0]
        patches = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            precision=PRECISION,
            name="patch_embedding",
        )(pixels)
        patches = patches.reshape(B, -1, self.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden_size,)
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.hidden_size)), patches], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            ((self.image_size // self.patch_size) ** 2 + 1, self.hidden_size),
        )
        h = h + pos[None]
        h = nn.LayerNorm(epsilon=self.eps, name="pre_ln")(h)
        for i in range(self.num_layers):
            h = CLIPLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.eps,
                name=f"layer{i}",
            )(h, None)
        pooled = nn.LayerNorm(epsilon=self.eps, name="post_ln")(h[:, 0])
        proj = self.param(
            "visual_projection",
            nn.initializers.normal(0.02),
            (self.hidden_size, self.projection_dim),
        )
        out = jnp.matmul(pooled, proj, precision=PRECISION)
        if return_hidden:
            return out, h
        return out


def clip_vision_from_hf_state(state_dict) -> dict:
    """HF CLIPVisionModelWithProjection state_dict -> flax variables.
    Also accepts full CLIPModel dumps (keys under ``vision_model.`` plus
    ``visual_projection.weight``)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    pre = "vision_model."
    p: dict = {
        "class_embedding": sd[f"{pre}embeddings.class_embedding"],
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        "patch_embedding": {
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": np.transpose(
                sd[f"{pre}embeddings.patch_embedding.weight"], (2, 3, 1, 0)
            )
        },
        "pre_ln": _ln_p(sd, f"{pre}pre_layrnorm"),  # HF's historical typo
        "post_ln": _ln_p(sd, f"{pre}post_layernorm"),
        "visual_projection": np.transpose(sd["visual_projection.weight"], (1, 0)),
    }
    i = 0
    while f"{pre}encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        base = f"{pre}encoder.layers.{i}"
        p[f"layer{i}"] = {
            "q": _dense_p(sd, f"{base}.self_attn.q_proj"),
            "k": _dense_p(sd, f"{base}.self_attn.k_proj"),
            "v": _dense_p(sd, f"{base}.self_attn.v_proj"),
            "attn_out": _dense_p(sd, f"{base}.self_attn.out_proj"),
            "ln1": _ln_p(sd, f"{base}.layer_norm1"),
            "ln2": _ln_p(sd, f"{base}.layer_norm2"),
            "fc1": _dense_p(sd, f"{base}.mlp.fc1"),
            "fc2": _dense_p(sd, f"{base}.mlp.fc2"),
        }
        i += 1
    return {"params": p}


def clip_preprocess(frames_thwc, image_size=224):
    """Resize (bicubic) + CLIP-normalize uint8 (T, H, W, 3) frames to the
    model's input.  Matches openai's Compose(Resize, CenterCrop,
    Normalize) for square inputs up to interpolation-kernel differences
    (PIL bicubic vs jax.image bicubic)."""
    import jax

    x = jnp.asarray(frames_thwc, jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], image_size, image_size, x.shape[3]), method="bicubic"
    )
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
