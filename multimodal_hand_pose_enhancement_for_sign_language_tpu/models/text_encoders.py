"""JAX-native text encoder towers: BERT-family (MiniLM / bert-base) and
the CLIP text transformer, with HuggingFace-torch weight converters.

TPU-native replacements for the reference text featurizers
(/root/reference/proc_text.py:57-100):

  * ``BertEncoder``      — HF ``BertModel`` semantics (post-LN, exact
    erf GELU, learned positions + token types, eps 1e-12).  Covers both
    "BERTword" (bert-base-uncased, sum of last 4 hidden states,
    proc_text.py:67-92) and "BERTsentence" (paraphrase-MiniLM-L6-v2,
    masked mean pooling, proc_text.py:94-100).
  * ``CLIPTextEncoder``  — CLIP ViT-B/32 text transformer semantics
    (pre-LN, quickGELU, causal mask, EOS pooling + linear projection,
    proc_text.py:60-65) as implemented by HF ``CLIPTextModelWithProjection``.

Weights convert one-to-one from torch state_dicts via
``bert_from_hf_state`` / ``clip_text_from_hf_state`` (the
``models/resnet.py`` pattern); eval outputs then agree to float
tolerance (tests/test_text_encoders.py uses randomly-initialized HF
torch models as the oracle, so no downloads are needed to validate the
converters + numerics).

Attention lowers to batched MXU matmuls; sequences are fixed-length
(BERT pads to max_length, CLIP to 77) so XLA sees static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e9  # additive attention mask fill


def _split_heads(x, n_heads):
    B, T, D = x.shape
    return x.reshape(B, T, n_heads, D // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, T, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)


# Featurizer towers pin matmuls to f32-accurate precision: on TPU the
# default lowers to bf16 MXU passes, which is fine for training hot loops
# but would cost ~1e-2 absolute error vs the torch oracles here.
PRECISION = jax.lax.Precision.HIGHEST


def _dense(features, name):
    return nn.Dense(features, precision=PRECISION, name=name)


def _attention(q, k, v, bias):
    """(B, H, T, Dh) scaled dot-product attention with additive bias."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, precision=PRECISION)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, precision=PRECISION)


# ---------------------------------------------------------------------------
# BERT family (bert-base-uncased, MiniLM-L6)
# ---------------------------------------------------------------------------


class BertLayer(nn.Module):
    """One post-LN BERT encoder block (HF BertLayer)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, h, attn_bias):
        q = _dense(self.hidden_size, name="q")(h)
        k = _dense(self.hidden_size, name="k")(h)
        v = _dense(self.hidden_size, name="v")(h)
        ctx = _merge_heads(
            _attention(
                _split_heads(q, self.num_heads),
                _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads),
                attn_bias,
            )
        )
        attn_out = _dense(self.hidden_size, name="attn_out")(ctx)
        h = nn.LayerNorm(epsilon=self.eps, name="attn_ln")(h + attn_out)
        inter = jax.nn.gelu(
            _dense(self.intermediate_size, name="fc1")(h), approximate=False
        )
        out = _dense(self.hidden_size, name="fc2")(inter)
        return nn.LayerNorm(epsilon=self.eps, name="out_ln")(h + out)


class BertEncoder(nn.Module):
    """HF ``BertModel`` (encoder only, no pooler) in flax.

    Returns the last hidden state; with ``output_hidden_states=True``
    returns (last_hidden, all_hidden) where all_hidden includes the
    embedding output — matching HF's ``hidden_states`` tuple so the
    reference's last-4-layer sum (proc_text.py:88-92) ports directly.
    """

    vocab_size: int
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    eps: float = 1e-12

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        output_hidden_states: bool = False,
    ):
        B, T = input_ids.shape
        word = nn.Embed(self.vocab_size, self.hidden_size, name="word_embeddings")(
            input_ids
        )
        pos = nn.Embed(
            self.max_position, self.hidden_size, name="position_embeddings"
        )(jnp.arange(T)[None, :])
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(
            self.type_vocab_size, self.hidden_size, name="token_type_embeddings"
        )(token_type_ids)
        h = nn.LayerNorm(epsilon=self.eps, name="embeddings_ln")(word + pos + typ)

        if attention_mask is not None:
            bias = (1.0 - attention_mask[:, None, None, :].astype(h.dtype)) * NEG_INF
        else:
            bias = None
        hiddens = [h]
        for i in range(self.num_layers):
            h = BertLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.eps,
                name=f"layer{i}",
            )(h, bias)
            hiddens.append(h)
        if output_hidden_states:
            return h, hiddens
        return h


def bert_mean_pool(last_hidden, attention_mask):
    """sentence-transformers masked mean pooling (data/text.py contract)."""
    mask = attention_mask[..., None].astype(last_hidden.dtype)
    return (last_hidden * mask).sum(1) / jnp.clip(mask.sum(1), 1e-9, None)


def _dense_p(sd, key):
    return {
        "kernel": np.transpose(np.asarray(sd[f"{key}.weight"]), (1, 0)),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _ln_p(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}


def bert_from_hf_state(state_dict) -> dict:
    """HF BertModel state_dict -> flax BertEncoder variables."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # some dumps carry the "bert." prefix
    if any(k.startswith("bert.") for k in sd):
        sd = {k[len("bert."):]: v for k, v in sd.items() if k.startswith("bert.")}
    p: dict = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]
        },
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]
        },
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]
        },
        "embeddings_ln": _ln_p(sd, "embeddings.LayerNorm"),
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        base = f"encoder.layer.{i}"
        p[f"layer{i}"] = {
            "q": _dense_p(sd, f"{base}.attention.self.query"),
            "k": _dense_p(sd, f"{base}.attention.self.key"),
            "v": _dense_p(sd, f"{base}.attention.self.value"),
            "attn_out": _dense_p(sd, f"{base}.attention.output.dense"),
            "attn_ln": _ln_p(sd, f"{base}.attention.output.LayerNorm"),
            "fc1": _dense_p(sd, f"{base}.intermediate.dense"),
            "fc2": _dense_p(sd, f"{base}.output.dense"),
            "out_ln": _ln_p(sd, f"{base}.output.LayerNorm"),
        }
        i += 1
    return {"params": p}


# ---------------------------------------------------------------------------
# CLIP text transformer (ViT-B/32 text tower)
# ---------------------------------------------------------------------------


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPLayer(nn.Module):
    """One pre-LN CLIP encoder block (HF CLIPEncoderLayer)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, h, attn_bias):
        x = nn.LayerNorm(epsilon=self.eps, name="ln1")(h)
        q = _dense(self.hidden_size, name="q")(x)
        k = _dense(self.hidden_size, name="k")(x)
        v = _dense(self.hidden_size, name="v")(x)
        ctx = _merge_heads(
            _attention(
                _split_heads(q, self.num_heads),
                _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads),
                attn_bias,
            )
        )
        h = h + _dense(self.hidden_size, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=self.eps, name="ln2")(h)
        x = quick_gelu(_dense(self.intermediate_size, name="fc1")(x))
        return h + _dense(self.hidden_size, name="fc2")(x)


class CLIPTextEncoder(nn.Module):
    """CLIP's text tower incl. the final projection (encode_text output).

    Matches HF ``CLIPTextModelWithProjection`` / openai CLIP
    ``encode_text``: causal self-attention, final LayerNorm, pooled state
    at each sequence's argmax(input_ids) position (the EOS token has the
    highest id in CLIP's vocab), then a bias-free linear projection.
    """

    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    max_position: int = 77
    projection_dim: int = 512
    eps: float = 1e-5
    # pooled position: first occurrence of eos_token_id (modern HF
    # contract); None falls back to argmax(input_ids) — identical for
    # real CLIP vocab where EOS (49407) is the highest id and appears
    # exactly once per sequence (openai encode_text semantics).
    eos_token_id: Optional[int] = 49407

    @nn.compact
    def __call__(self, input_ids, return_hidden: bool = False):
        B, T = input_ids.shape
        h = nn.Embed(self.vocab_size, self.hidden_size, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_position, self.hidden_size),
        )
        h = h + pos[None, :T, :]
        causal = jnp.triu(jnp.full((T, T), NEG_INF, h.dtype), k=1)[None, None]
        for i in range(self.num_layers):
            h = CLIPLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.eps,
                name=f"layer{i}",
            )(h, causal)
        h = nn.LayerNorm(epsilon=self.eps, name="final_ln")(h)
        if self.eos_token_id is None:
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            eos_pos = jnp.argmax(
                (input_ids == self.eos_token_id).astype(jnp.int32), axis=-1
            )
        pooled = h[jnp.arange(B), eos_pos]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(0.02),
            (self.hidden_size, self.projection_dim),
        )
        out = jnp.matmul(pooled, proj, precision=PRECISION)
        if return_hidden:
            return out, h
        return out


def clip_text_from_hf_state(state_dict) -> dict:
    """HF CLIPTextModelWithProjection state_dict -> flax variables.

    Also accepts a full CLIPModel dump (keys under ``text_model.`` plus
    ``text_projection.weight``) and openai-CLIP dumps re-keyed by HF's
    conversion script.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    pre = "text_model."
    p: dict = {
        "token_embedding": {"embedding": sd[f"{pre}embeddings.token_embedding.weight"]},
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        "final_ln": _ln_p(sd, f"{pre}final_layer_norm"),
        "text_projection": np.transpose(sd["text_projection.weight"], (1, 0)),
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


# ---------------------------------------------------------------------------
# loading helpers (torch only as converter input)
# ---------------------------------------------------------------------------


def load_torch_state(path: str) -> dict:
    """Load a torch .pth/.bin state_dict (CPU map) for conversion."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def bert_config_from_state(sd: dict, num_heads: int = 12) -> dict:
    """Infer BertEncoder constructor kwargs from a state dict.  The head
    count is not recoverable from weight shapes and must be supplied
    (12 for both bert-base-uncased and MiniLM-L6)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(k.startswith("bert.") for k in sd):
        sd = {k[len("bert."):]: v for k, v in sd.items() if k.startswith("bert.")}
    vocab, hidden = sd["embeddings.word_embeddings.weight"].shape
    inter = sd["encoder.layer.0.intermediate.dense.weight"].shape[0]
    n_layers = 0
    while f"encoder.layer.{n_layers}.attention.self.query.weight" in sd:
        n_layers += 1
    return dict(
        vocab_size=int(vocab),
        hidden_size=int(hidden),
        num_layers=n_layers,
        num_heads=num_heads,
        intermediate_size=int(inter),
        max_position=int(sd["embeddings.position_embeddings.weight"].shape[0]),
        type_vocab_size=int(sd["embeddings.token_type_embeddings.weight"].shape[0]),
    )
