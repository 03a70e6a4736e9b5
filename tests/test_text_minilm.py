"""MiniLM tokenizer/encoder unit tests (weights not required)."""
import jax
import numpy as np
import pytest

from vae_hmc_tpu.text.minilm import MiniLM, MiniLMConfig, WordPieceTokenizer


@pytest.fixture(scope="module")
def tok():
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "cat", "sat", "##s",
         "mat", "##ting", "un", "##believ", "##able", "hello", "world"])}
    return WordPieceTokenizer(vocab, max_len=16)


def test_wordpiece_greedy_longest_match(tok):
    ids, mask = tok.encode_batch(["the cats sat"])
    toks = ids[0][mask[0] > 0]
    # [CLS] the cat ##s sat [SEP]
    assert list(toks) == [tok.cls, tok.vocab["the"], tok.vocab["cat"],
                          tok.vocab["##s"], tok.vocab["sat"], tok.sep]


def test_wordpiece_unk_and_multi_piece(tok):
    ids, mask = tok.encode_batch(["unbelievable zzz"])
    toks = list(ids[0][mask[0] > 0])
    assert toks == [tok.cls, tok.vocab["un"], tok.vocab["##believ"],
                    tok.vocab["##able"], tok.unk, tok.sep]


def test_wordpiece_lowercase_and_punct(tok):
    ids, _ = tok.encode_batch(["The CAT!"])
    assert tok.vocab["the"] in ids[0]
    assert tok.vocab["cat"] in ids[0]


def test_padding_and_mask(tok):
    ids, mask = tok.encode_batch(["hello", "hello world the cat"])
    assert ids.shape == mask.shape
    assert mask[0].sum() < mask[1].sum()
    assert ids[0][int(mask[0].sum()):].tolist() == [tok.pad] * (
        ids.shape[1] - int(mask[0].sum()))


def test_minilm_forward_shapes_and_norm():
    """Random-weight forward: output is (B, 384) and L2-normalized, and
    padding tokens do not affect the embedding (mask correctness)."""
    cfg = MiniLMConfig()
    model = MiniLM(cfg)
    ids = np.array([[101, 2003, 2004, 102, 0, 0]], dtype=np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], dtype=np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (1, 384)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, atol=1e-5)
    # changing a masked-out token must not change the embedding
    ids2 = ids.copy()
    ids2[0, 5] = 999
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_synthetic_minilm_and_fixed_shape_encode():
    """synthetic_minilm builds the real parameter shapes + a corpus vocab;
    encode_texts at a fixed pad length is batch-composition invariant (the
    bench's single-program guarantee) and respects the padding."""
    from vae_hmc_tpu.text.minilm import encode_texts, synthetic_minilm

    texts = ["the rain falls down", "a song about love and loss",
             "hello world", "", "the the the"]
    model, params, tok = synthetic_minilm(texts)
    p = params["params"]
    cfg = MiniLMConfig()
    assert p["tok_emb"]["embedding"].shape == (cfg.vocab_size, cfg.hidden)
    assert p["layer5"]["ff1"]["kernel"].shape == (cfg.hidden,
                                                  cfg.intermediate)
    assert tok.vocab["rain"] > 3           # corpus words are whole entries

    full = encode_texts(model, params, tok, texts, batch_size=2, pad_to=16)
    assert full.shape == (5, 384)
    np.testing.assert_allclose(np.linalg.norm(full, axis=-1), 1.0, atol=1e-5)
    # different batching, same fixed shape -> identical embeddings
    again = encode_texts(model, params, tok, texts, batch_size=5, pad_to=16)
    np.testing.assert_allclose(full, again, rtol=1e-5, atol=1e-6)


def test_equal_configs_share_scan_cache():
    """Advisor round 4: MiniLMConfig hashed by identity, so two loads of
    the same checkpoint compiled separate scan programs.  Frozen-dataclass
    configs make equal modules hash equal and share _scan_encode_jit."""
    from vae_hmc_tpu.text.minilm import MiniLM, _scan_encode_jit

    m1, m2 = MiniLM(MiniLMConfig()), MiniLM(MiniLMConfig())
    assert m1 == m2 and hash(m1) == hash(m2)
    assert _scan_encode_jit(m1) is _scan_encode_jit(m2)
