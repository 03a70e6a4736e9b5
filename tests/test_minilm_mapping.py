"""Golden test of the MiniLM HF-checkpoint weight mapping.

The reference's medium tier is defined by sentence-transformers
all-MiniLM-L6-v2 embeddings (reference scripts/11:84-93).  Real weights are
not available offline, but the *mapping* (HF name -> Flax param, torch
(out,in) -> Flax (in,out) transpose, LayerNorm weight/bias -> scale/bias)
can be fully exercised with a synthetic checkpoint: random weights in exact
HF BERT format, saved as model.safetensors, loaded through
`text.minilm.load_minilm`, and the Flax forward compared against an
independent numpy BERT oracle computing from the raw state dict.

Any transpose, name, or scale/bias swap in the mapping diverges immediately
(the oracle shares no code with vae_hmc_tpu.text.minilm).
"""
from __future__ import annotations

import numpy as np
import pytest
from scipy.special import erf

from vae_hmc_tpu.text.minilm import MiniLMConfig, load_minilm

CFG = MiniLMConfig()


def _make_hf_state_dict(rng: np.random.Generator) -> dict:
    """Random weights in all-MiniLM-L6-v2's exact HF tensor layout."""
    c = CFG
    sd = {
        "embeddings.word_embeddings.weight":
            rng.normal(0, 0.02, (c.vocab_size, c.hidden)),
        "embeddings.position_embeddings.weight":
            rng.normal(0, 0.02, (c.max_pos, c.hidden)),
        "embeddings.token_type_embeddings.weight":
            rng.normal(0, 0.02, (c.type_vocab, c.hidden)),
        "embeddings.LayerNorm.weight": rng.normal(1.0, 0.1, (c.hidden,)),
        "embeddings.LayerNorm.bias": rng.normal(0, 0.1, (c.hidden,)),
        # extra HF keys the loader must tolerate (real checkpoints have them)
        "pooler.dense.weight": rng.normal(0, 0.02, (c.hidden, c.hidden)),
        "pooler.dense.bias": rng.normal(0, 0.02, (c.hidden,)),
    }

    def dense(name, n_out, n_in):
        # torch nn.Linear stores weight as (out, in)
        sd[name + ".weight"] = rng.normal(0, 0.02, (n_out, n_in))
        sd[name + ".bias"] = rng.normal(0, 0.02, (n_out,))

    def ln(name):
        sd[name + ".weight"] = rng.normal(1.0, 0.1, (c.hidden,))
        sd[name + ".bias"] = rng.normal(0, 0.1, (c.hidden,))

    for i in range(c.layers):
        p = f"encoder.layer.{i}."
        dense(p + "attention.self.query", c.hidden, c.hidden)
        dense(p + "attention.self.key", c.hidden, c.hidden)
        dense(p + "attention.self.value", c.hidden, c.hidden)
        dense(p + "attention.output.dense", c.hidden, c.hidden)
        ln(p + "attention.output.LayerNorm")
        dense(p + "intermediate.dense", c.intermediate, c.hidden)
        dense(p + "output.dense", c.hidden, c.intermediate)
        ln(p + "output.LayerNorm")
    return {k: v.astype(np.float32) for k, v in sd.items()}


# --- independent numpy BERT oracle (float64, no shared code) ---------------


def _np_layernorm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _np_gelu(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _oracle_forward(sd, ids, mask):
    c = CFG
    sd = {k: v.astype(np.float64) for k, v in sd.items()}
    b, s = ids.shape
    h = (sd["embeddings.word_embeddings.weight"][ids]
         + sd["embeddings.position_embeddings.weight"][np.arange(s)][None]
         + sd["embeddings.token_type_embeddings.weight"][0][None, None])
    h = _np_layernorm(h, sd["embeddings.LayerNorm.weight"],
                      sd["embeddings.LayerNorm.bias"])
    d_head = c.hidden // c.heads
    bias = (1.0 - mask[:, None, None, :]) * -1e9
    for i in range(c.layers):
        p = f"encoder.layer.{i}."

        def lin(name, x):
            return x @ sd[p + name + ".weight"].T + sd[p + name + ".bias"]

        def split(t):  # (b, s, hidden) -> (b, heads, s, d_head)
            return t.reshape(b, s, c.heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = (split(lin("attention.self." + n, h))
                   for n in ("query", "key", "value"))
        att = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d_head) + bias
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        ctx = (att @ v).transpose(0, 2, 1, 3).reshape(b, s, c.hidden)
        h = _np_layernorm(h + lin("attention.output.dense", ctx),
                          sd[p + "attention.output.LayerNorm.weight"],
                          sd[p + "attention.output.LayerNorm.bias"])
        ff = lin("output.dense", _np_gelu(lin("intermediate.dense", h)))
        h = _np_layernorm(h + ff, sd[p + "output.LayerNorm.weight"],
                          sd[p + "output.LayerNorm.bias"])
    m = mask[:, :, None]
    pooled = (h * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    return pooled / np.maximum(
        np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    from safetensors.numpy import save_file
    d = tmp_path_factory.mktemp("minilm_ckpt")
    sd = _make_hf_state_dict(np.random.default_rng(1234))
    save_file(sd, d / "model.safetensors")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "cat", "sat", "on", "a", "mat", "##s"]
    vocab += [f"tok{i}" for i in range(len(vocab), 1000)]
    (d / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    return d, sd


def test_mapped_forward_matches_numpy_oracle(checkpoint_dir):
    d, sd = checkpoint_dir
    model, params, tok = load_minilm(d)
    ids, mask = tok.encode_batch(["the cats sat on a mat", "the cat"])
    got = np.asarray(model.apply(params, ids, mask))
    want = _oracle_forward(sd, ids, mask)
    assert got.shape == want.shape == (2, CFG.hidden)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_mapped_forward_bert_prefixed_checkpoint(checkpoint_dir, tmp_path):
    """sentence-transformers checkpoints sometimes carry a 'bert.' prefix;
    load_minilm strips it — same weights must give the same embedding."""
    from safetensors.numpy import save_file
    d, sd = checkpoint_dir
    d2 = tmp_path / "prefixed"
    d2.mkdir()
    save_file({"bert." + k: v for k, v in sd.items()},
              d2 / "model.safetensors")
    (d2 / "vocab.txt").write_text((d / "vocab.txt").read_text())
    model, params, tok = load_minilm(d)
    model2, params2, _ = load_minilm(d2)
    ids, mask = tok.encode_batch(["the cat sat"])
    np.testing.assert_allclose(np.asarray(model.apply(params, ids, mask)),
                               np.asarray(model2.apply(params2, ids, mask)),
                               atol=1e-6)


def test_pytorch_bin_loads_identically(checkpoint_dir, tmp_path):
    """The pytorch_model.bin path must produce the same params as the
    safetensors path (reference ships .bin checkpoints for this model)."""
    import torch
    d, sd = checkpoint_dir
    d2 = tmp_path / "binfmt"
    d2.mkdir()
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               d2 / "pytorch_model.bin")
    (d2 / "vocab.txt").write_text((d / "vocab.txt").read_text())
    _, p_st, tok = load_minilm(d)
    _, p_bin, _ = load_minilm(d2)
    ids, mask = tok.encode_batch(["the cat"])
    model, _, _ = load_minilm(d)
    np.testing.assert_allclose(np.asarray(model.apply(p_st, ids, mask)),
                               np.asarray(model.apply(p_bin, ids, mask)),
                               atol=1e-6)
