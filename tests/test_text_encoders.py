"""JAX-native text towers vs HuggingFace torch oracles.

The oracles are RANDOMLY-INITIALIZED HF models (no downloads): what's
under test is the architecture + weight converter + numerics — the same
pattern as tests/test_featurizers.py uses for the flax ResNet-50.
Covers the reference featurizers proc_text.py:60-65 (CLIP text),
:67-92 (BERTword last-4-layer sum), :94-100 (MiniLM mean pooling).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import (  # noqa: E402
    text_encoders,
)


@pytest.fixture(scope="module")
def bert_pair():
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=211,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        hidden_act="gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    ref = BertModel(cfg, add_pooling_layer=False)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    ours = text_encoders.BertEncoder(
        **text_encoders.bert_config_from_state(sd, num_heads=4)
    )
    variables = text_encoders.bert_from_hf_state(sd)
    return ref, ours, variables


def test_bert_encoder_matches_hf(bert_pair, rng):
    ref, ours, variables = bert_pair
    ids = rng.randint(0, 211, size=(2, 17))
    mask = np.ones((2, 17), np.int64)
    mask[1, 12:] = 0  # ragged batch
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    out = np.asarray(ours.apply(variables, jnp.asarray(ids), jnp.asarray(mask)))
    # masked positions are excluded: HF still computes them but any
    # consumer (mean pooling, last-4 sum over valid tokens) masks them
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref_out[valid], atol=2e-5)


def test_bertword_last4_sum_matches_hf(bert_pair, rng):
    """The reference's word-embedding recipe: sum of the last 4 hidden
    states incl. correctness of the hidden_states tuple indexing."""
    ref, ours, variables = bert_pair
    ids = rng.randint(0, 211, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    with torch.no_grad():
        hs = ref(
            torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        ).hidden_states
        ref_sum = torch.sum(torch.stack(hs[-4:], dim=0), dim=0).numpy()
    _, hiddens = ours.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask), output_hidden_states=True
    )
    our_sum = np.asarray(sum(hiddens[-4:]))
    np.testing.assert_allclose(our_sum, ref_sum, atol=2e-5)


def test_bert_mean_pool_matches_sentence_transformers(bert_pair, rng):
    ref, ours, variables = bert_pair
    ids = rng.randint(0, 211, size=(3, 11))
    mask = np.ones((3, 11), np.int64)
    mask[2, 6:] = 0
    with torch.no_grad():
        last = ref(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state
        m = torch.from_numpy(mask).unsqueeze(-1).float()
        ref_emb = ((last * m).sum(1) / m.sum(1).clamp(min=1e-9)).numpy()
    last_j = ours.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    emb = np.asarray(text_encoders.bert_mean_pool(last_j, jnp.asarray(mask)))
    np.testing.assert_allclose(emb, ref_emb, atol=2e-5)


def test_clip_text_encoder_matches_hf(rng):
    from transformers import CLIPTextConfig
    from transformers.models.clip.modeling_clip import CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=19,
        projection_dim=24,
        eos_token_id=98,  # pooled position: first EOS occurrence
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    ref = CLIPTextModelWithProjection(cfg)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    ours = text_encoders.CLIPTextEncoder(
        vocab_size=99,
        hidden_size=32,
        num_layers=3,
        num_heads=4,
        intermediate_size=64,
        max_position=19,
        projection_dim=24,
        eos_token_id=98,
    )
    variables = text_encoders.clip_text_from_hf_state(sd)

    # EOS (the pooled position) must be the max id, like in CLIP's vocab
    ids = rng.randint(0, 98, size=(2, 19))
    ids[0, 7] = 98
    ids[1, 18] = 98
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).text_embeds.numpy()
    out = np.asarray(ours.apply(variables, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref_out, atol=2e-5)


def test_clip_text_causal_mask(rng):
    """Future tokens must not influence earlier positions' hidden states."""
    ours = text_encoders.CLIPTextEncoder(
        vocab_size=50, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, max_position=12, projection_dim=8,
    )
    ids = rng.randint(0, 49, size=(1, 12))
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    _, h1 = ours.apply(variables, jnp.asarray(ids), return_hidden=True)
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % 49  # perturb only the last token
    _, h2 = ours.apply(variables, jnp.asarray(ids2), return_hidden=True)
    np.testing.assert_allclose(
        np.asarray(h1)[:, :-1], np.asarray(h2)[:, :-1], atol=1e-6
    )


def test_obtain_embeddings_flax_route(tmp_path, rng):
    """data/text.py end-to-end through the flax tower with a LOCAL HF
    snapshot (random weights): torch is only the checkpoint reader."""
    from transformers import BertConfig, BertModel, BertTokenizer

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import text

    d = tmp_path / "minilm"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world", "sign",
             "##s", "language", "pose"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizer(str(d / "vocab.txt"))
    tok.save_pretrained(str(d))
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=24, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.save_pretrained(str(d))

    tf = tmp_path / "text.txt"
    tf.write_text(
        "clipA-utt01 hello world\nclipB-utt01 sign language pose\n"
    )
    emb = text.obtain_embeddings(
        str(tf), ["clipA-utt01", "clipB-utt01"], method="BERTsentence",
        weights_path=str(d),
    )
    assert emb.shape == (2, 16)
    assert np.isfinite(emb).all()

    # oracle: same snapshot through torch + masked mean pooling
    model.eval()
    enc = tok(["hello world", "sign language pose"], padding=True,
              truncation=True, return_tensors="pt")
    with torch.no_grad():
        last = model(**enc).last_hidden_state
    m = enc["attention_mask"].unsqueeze(-1).float()
    ref = ((last * m).sum(1) / m.sum(1).clamp(min=1e-9)).numpy()
    np.testing.assert_allclose(emb, ref, atol=2e-5)

    word = text.obtain_embeddings(
        str(tf), ["clipA-utt01", "clipB-utt01"], method="BERTword",
        weights_path=str(d),
    )
    assert word.shape[0] == 2 and word.shape[-1] == 16

    # the --embeds_type average variant through the SAME encoder
    # (proc_text.py:133-139: sort ids, encode, tile the column mean) —
    # ids passed unsorted to cover the sort, oracle from the torch ref
    avg = text.obtain_avg_embed(
        str(tf), ["clipB-utt01", "clipA-utt01"], method="BERTsentence",
        weights_path=str(d),
    )
    assert avg.shape == (2, 16)
    np.testing.assert_allclose(avg, np.tile(ref.mean(0), (2, 1)), atol=2e-5)
    # and the persisted-embeddings derivation is equivalent
    np.testing.assert_allclose(avg, text.average_embeds(emb), atol=2e-5)


def test_clip_vision_encoder_matches_hf(rng):
    from transformers import CLIPVisionConfig
    from transformers.models.clip.modeling_clip import (
        CLIPVisionModelWithProjection,
    )

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import (
        clip_vision,
    )

    cfg = CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, image_size=48, patch_size=16,
        projection_dim=24, attn_implementation="eager",
    )
    torch.manual_seed(0)
    ref = CLIPVisionModelWithProjection(cfg)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    ours = clip_vision.CLIPVisionEncoder(
        hidden_size=32, num_layers=3, num_heads=4, intermediate_size=64,
        image_size=48, patch_size=16, projection_dim=24,
    )
    variables = clip_vision.clip_vision_from_hf_state(sd)
    px = rng.randn(2, 48, 48, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(np.moveaxis(px, -1, 1))
        ).image_embeds.numpy()
    out = np.asarray(ours.apply(variables, jnp.asarray(px)))
    np.testing.assert_allclose(out, ref_out, atol=3e-5)


def test_obtain_feats_crops_clip_flax_route(tmp_path, rng):
    """data/video.py CLIP-image featurizer through the flax tower off a
    local full-CLIPModel snapshot."""
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import video

    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(
            vocab_size=49, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=8,
        ),
        CLIPVisionConfig(
            hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=32, image_size=32, patch_size=16,
        ),
        projection_dim=12,
    )
    torch.manual_seed(0)
    CLIPModel(cfg).save_pretrained(str(tmp_path / "clip"))
    crops = rng.randint(0, 255, size=(3, 3, 24, 24, 2)).astype(np.float32)
    feats = video.obtain_feats_crops_clip(
        [crops], weights_path=str(tmp_path / "clip")
    )
    assert len(feats) == 1
    assert feats[0].shape == (3, 24)  # 12 per hand, hstacked
    assert np.isfinite(feats[0]).all()
