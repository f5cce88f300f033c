"""Text featurizer: sentence loading, grouping and embeddings.

Re-design of proc_text.py (/root/reference/proc_text.py).  Differences:
paths are arguments instead of hard-coded cluster paths (:9-13), and the
embedding extractors are import-gated — the training/inference paths
consume precomputed embedding pickles (the reference's own contract via
load_windows), so heavyweight encoders are optional one-time tooling:

  * "precomputed"   — no-op (embeddings come from pickles),
  * "BERTword"      — bert-base-uncased, sum of last 4 hidden layers
    (proc_text.py:67-92); needs `transformers` + local weights,
  * "BERTsentence"  — MiniLM-L6-v2 mean-pooled sentence embeddings
    (proc_text.py:94-100); implemented directly on `transformers`
    (sentence_transformers is not required),
  * "clip"          — CLIP ViT-B/32 text encoder (proc_text.py:60-65);
    needs the `clip` package + weights.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.openpose import (
    natural_keys,
)


def _group_by_clip(dict_text: dict) -> dict:
    """Concatenate utterance sentences per 11-char video id
    (proc_text.py:28-36)."""
    utterance_ids = sorted(dict_text.keys(), key=natural_keys)
    grouped: dict = {}
    for utt_id in utterance_ids:
        vid = utt_id[:11]
        if vid not in grouped:
            grouped[vid] = dict_text[utt_id].replace("\n", " ")
        else:
            grouped[vid] += dict_text[utt_id].replace("\n", " ")
    return grouped


def load_text(file_path: str, ids, groupByClip: bool = False) -> list:
    """Parse `<id> <sentence>` lines, keep requested ids, sort by id
    (proc_text.py:39-53)."""
    ids = set(ids)
    dict_text = {}
    with open(file_path) as fp:
        for line in fp:
            if not line.strip():
                continue
            utt_id, text = line.split(" ", 1)
            if utt_id in ids:
                dict_text[utt_id] = text
    if groupByClip:
        dict_text = _group_by_clip(dict_text)
    return [v for _, v in sorted(dict_text.items())]


def get_clip_ids(file_path: str) -> list:
    """Ids for which text is available (proc_text.py:104-111)."""
    id_list = []
    with open(file_path) as fp:
        for line in fp:
            if not line.strip():
                continue
            utt_id, _ = line.split(" ", 1)
            id_list.append(utt_id)
    return id_list


def obtain_embeddings(
    file_path: str, ids, method: str = "BERTsentence", groupByClip: bool = False
) -> Optional[np.ndarray]:
    """Sentence embeddings for each clip (proc_text.py:57-100)."""
    if method == "precomputed":
        return None
    sentence_list = load_text(file_path, ids, groupByClip=groupByClip)

    if method == "clip":
        import clip
        import torch

        model, _ = clip.load("ViT-B/32", "cpu")
        toks = torch.cat([clip.tokenize(s, truncate=True) for s in sentence_list])
        with torch.no_grad():
            return model.encode_text(toks).cpu().numpy()

    if method == "BERTword":
        import torch
        from transformers import BertModel, BertTokenizer

        tokenizer = BertTokenizer.from_pretrained("bert-base-uncased")
        enc = tokenizer.batch_encode_plus(
            sentence_list,
            add_special_tokens=True,
            padding="max_length",
            max_length=512,
            truncation=True,
            return_tensors="pt",
        )
        model = BertModel.from_pretrained("bert-base-uncased", output_hidden_states=True)
        model.eval()
        with torch.no_grad():
            outputs = model(enc["input_ids"], enc["attention_mask"])
            hidden = outputs[2]
        return torch.sum(torch.stack(hidden[-4:], dim=0), dim=0).numpy()

    if method == "BERTsentence":
        import torch
        from transformers import AutoModel, AutoTokenizer

        name = "sentence-transformers/paraphrase-MiniLM-L6-v2"
        tokenizer = AutoTokenizer.from_pretrained(name)
        model = AutoModel.from_pretrained(name)
        model.eval()
        enc = tokenizer(
            sentence_list, padding=True, truncation=True, return_tensors="pt"
        )
        with torch.no_grad():
            out = model(**enc)
        # mean pooling with attention mask (what sentence-transformers does)
        mask = enc["attention_mask"].unsqueeze(-1).float()
        emb = (out.last_hidden_state * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        return emb.numpy()

    raise ValueError(f"unknown text embedding method {method!r}")


def obtain_avg_embed(file_path: str, ids, method="BERTsentence", subset: float = 1.0):
    """Dataset-mean embedding tiled per clip (proc_text.py:133-139)."""
    ids = sorted(ids)
    idx_max = int(len(ids) * subset)
    embeds = obtain_embeddings(file_path, ids[:idx_max], method=method)
    col_mean = np.average(embeds, axis=0)
    return np.tile(col_mean, (embeds.shape[0], 1))
