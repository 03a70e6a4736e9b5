"""MiniLM (all-MiniLM-L6-v2) sentence encoder in Flax.

TPU-native replacement for the torch sentence-transformers encoder used by
the reference (scripts/11:85-93, 18:211-213): a 6-layer / 384-wide / 12-head
BERT encoder, mean-pooled over the attention mask and L2-normalized
(the exact sentence-transformers pooling config of all-MiniLM-L6-v2).

Weights are NOT bundled (zero-egress environments cannot download them);
`load_minilm(model_dir)` loads a local HuggingFace checkout (pytorch_model.bin
or model.safetensors + vocab.txt) and maps parameters by name.  When no
checkpoint is available the pipelines fall back to TF-IDF / hashed features
(vae_hmc_tpu.text.embed), mirroring the reference's own sentence-transformers
-> TF-IDF fallback (18:209-222).
"""
from __future__ import annotations

import dataclasses
import functools
import re
from pathlib import Path
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MiniLMConfig:
    """all-MiniLM-L6-v2 hyperparameters (reference script 11 embeds with
    this exact sentence-transformers model).  Frozen dataclass so equal
    configs hash equal: _scan_encode_jit's lru_cache keys on the Flax
    module, and identity-hashing configs made two loads of the same
    checkpoint compile separately (advisor round 4)."""
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    intermediate: int = 1536
    max_pos: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12
    max_seq_len: int = 256  # sentence-transformers truncates at 256 here


class _Layer(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, h, mask_bias):
        c = self.cfg
        d_head = c.hidden // c.heads
        q = nn.Dense(c.hidden, name="q")(h)
        k = nn.Dense(c.hidden, name="k")(h)
        v = nn.Dense(c.hidden, name="v")(h)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], c.heads, d_head)

        att = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)) / np.sqrt(d_head)
        att = jax.nn.softmax(att + mask_bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, split(v))
        ctx = ctx.reshape(h.shape)
        att_out = nn.Dense(c.hidden, name="att_out")(ctx)
        h = nn.LayerNorm(epsilon=c.ln_eps, name="att_ln")(h + att_out)
        ff = nn.Dense(c.intermediate, name="ff1")(h)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(c.hidden, name="ff2")(ff)
        return nn.LayerNorm(epsilon=c.ln_eps, name="ff_ln")(h + ff)


class MiniLM(nn.Module):
    cfg: MiniLMConfig = MiniLMConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        c = self.cfg
        seq = input_ids.shape[1]
        tok = nn.Embed(c.vocab_size, c.hidden, name="tok_emb")(input_ids)
        pos = nn.Embed(c.max_pos, c.hidden, name="pos_emb")(
            jnp.arange(seq)[None, :])
        typ = nn.Embed(c.type_vocab, c.hidden, name="type_emb")(
            jnp.zeros_like(input_ids))
        h = nn.LayerNorm(epsilon=c.ln_eps, name="emb_ln")(tok + pos + typ)
        mask_bias = (1.0 - attention_mask[:, None, None, :]) * -1e9
        for i in range(c.layers):
            h = _Layer(c, name=f"layer{i}")(h, mask_bias)
        # mean pooling over attention mask + L2 norm (st pooling config)
        m = attention_mask[:, :, None]
        pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# WordPiece tokenizer (BERT uncased)
# ---------------------------------------------------------------------------


class WordPieceTokenizer:
    def __init__(self, vocab: Dict[str, int], max_len: int = 256):
        self.vocab = vocab
        self.max_len = max_len
        self.cls = vocab["[CLS]"]
        self.sep = vocab["[SEP]"]
        self.pad = vocab["[PAD]"]
        self.unk = vocab["[UNK]"]

    @classmethod
    def from_vocab_file(cls, path: Path, max_len: int = 256):
        vocab = {}
        for i, line in enumerate(Path(path).read_text(encoding="utf-8").splitlines()):
            vocab[line.strip()] = i
        return cls(vocab, max_len)

    def _basic_tokens(self, text: str) -> List[str]:
        text = text.lower()
        text = re.sub(r"\s+", " ", text)
        out, buf = [], []
        for ch in text:
            if ch.isalnum():
                buf.append(ch)
            else:
                if buf:
                    out.append("".join(buf))
                    buf = []
                if not ch.isspace():
                    out.append(ch)
        if buf:
            out.append("".join(buf))
        return out

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > 100:
            return [self.unk]
        ids, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            ids.append(cur)
            start = end
        return ids

    def encode_batch(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        rows = []
        for t in texts:
            ids = [self.cls]
            for w in self._basic_tokens(t):
                ids.extend(self._wordpiece(w))
                if len(ids) >= self.max_len - 1:
                    break
            ids = ids[: self.max_len - 1] + [self.sep]
            rows.append(ids)
        seq = max(len(r) for r in rows)
        out = np.full((len(rows), seq), self.pad, dtype=np.int32)
        mask = np.zeros((len(rows), seq), dtype=np.float32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
            mask[i, : len(r)] = 1.0
        return out, mask


# ---------------------------------------------------------------------------
# Weight loading from a local HF checkout
# ---------------------------------------------------------------------------

_HF_MAP = {
    "tok_emb": "embeddings.word_embeddings.weight",
    "pos_emb": "embeddings.position_embeddings.weight",
    "type_emb": "embeddings.token_type_embeddings.weight",
    "emb_ln": ("embeddings.LayerNorm.weight", "embeddings.LayerNorm.bias"),
}


def _layer_map(i: int) -> Dict[str, str]:
    p = f"encoder.layer.{i}."
    return {
        "q": p + "attention.self.query",
        "k": p + "attention.self.key",
        "v": p + "attention.self.value",
        "att_out": p + "attention.output.dense",
        "att_ln": p + "attention.output.LayerNorm",
        "ff1": p + "intermediate.dense",
        "ff2": p + "output.dense",
        "ff_ln": p + "output.LayerNorm",
    }


def _load_state_dict(model_dir: Path) -> Dict[str, np.ndarray]:
    model_dir = Path(model_dir)
    st = model_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file
        return dict(load_file(st))
    bin_p = model_dir / "pytorch_model.bin"
    if bin_p.exists():
        import torch
        sd = torch.load(bin_p, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights in {model_dir}")


def load_minilm(model_dir: Path):
    """-> (MiniLM module, params, tokenizer). Raises if weights are absent."""
    model_dir = Path(model_dir)
    sd = _load_state_dict(model_dir)
    sd = {k.removeprefix("bert."): v for k, v in sd.items()}
    cfg = MiniLMConfig()
    model = MiniLM(cfg)
    tok = WordPieceTokenizer.from_vocab_file(model_dir / "vocab.txt",
                                             cfg.max_seq_len)
    ids = np.zeros((1, 4), np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, np.ones((1, 4), np.float32))
    p = params["params"]

    def dense(dst, src):
        dst["kernel"] = jnp.asarray(sd[src + ".weight"]).T
        dst["bias"] = jnp.asarray(sd[src + ".bias"])

    def ln(dst, src):
        dst["scale"] = jnp.asarray(sd[src + ".weight"])
        dst["bias"] = jnp.asarray(sd[src + ".bias"])

    p["tok_emb"]["embedding"] = jnp.asarray(sd[_HF_MAP["tok_emb"]])
    p["pos_emb"]["embedding"] = jnp.asarray(sd[_HF_MAP["pos_emb"]])
    p["type_emb"]["embedding"] = jnp.asarray(sd[_HF_MAP["type_emb"]])
    ln(p["emb_ln"], "embeddings.LayerNorm")
    for i in range(cfg.layers):
        lm = _layer_map(i)
        lp = p[f"layer{i}"]
        for name in ("q", "k", "v", "att_out", "ff1", "ff2"):
            dense(lp[name], lm[name])
        ln(lp["att_ln"], lm["att_ln"])
        ln(lp["ff_ln"], lm["ff_ln"])
    return model, {"params": p}, tok


def synthetic_minilm(texts: List[str] = (), seed: int = 7):
    """Real-shaped, randomly-initialized MiniLM + a corpus-derived vocab.

    For benchmarking the transformer path when the real checkpoint cannot
    be downloaded (zero-egress environments): the parameter shapes, program
    structure and therefore compute cost are EXACTLY those of the real
    all-MiniLM-L6-v2 forward (the weight mapping itself is golden-tested in
    tests/test_minilm_mapping.py); only the values are random, so the
    embeddings are meaningless for quality.  The vocab contains every word
    of `texts` as a whole-word entry, so WordPiece matching walks the same
    longest-match path it would with a real vocab instead of degenerating
    to [UNK].
    """
    cfg = MiniLMConfig()
    model = MiniLM(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                 np.zeros((1, 4), np.int32),
                                 np.ones((1, 4), np.float32))
    vocab: Dict[str, int] = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for t in texts:
        for w in re.findall(r"[a-z0-9']+", t.lower()):
            if len(vocab) >= cfg.vocab_size:
                break
            vocab.setdefault(w, len(vocab))
    tok = WordPieceTokenizer(vocab, cfg.max_seq_len)
    return model, params, tok


@functools.lru_cache(maxsize=8)
def _scan_encode_jit(model):
    """One jitted scan-encode program PER MODEL, cached at module level.

    A fresh ``jax.jit`` wrapper per call would re-trace (and, when the
    persistent compile cache misses, re-COMPILE) the whole scanned
    transformer on every call — observed live in the round-4 TPU
    re-certification: bench's warmed-then-timed encode paid a full
    second compile inside the timed region (32.6 s) until the persistent
    cache caught up.  Flax modules are frozen dataclasses, so they are
    valid lru_cache keys; jit itself handles per-shape retraces.
    """
    def scan_fn(p, i3, m3):
        return jax.lax.scan(
            lambda _, im: (None, model.apply(p, im[0], im[1])),
            None, (i3, m3))[1]
    return jax.jit(scan_fn)


def encode_texts(model, params, tok: WordPieceTokenizer, texts: List[str],
                 batch_size: int = 128, pad_to: int = 0,
                 to_host: bool = True):
    """Whole corpus encode as ONE scanned program at ONE fixed
    (batch, seq) shape.

    Two dispatch hazards both avoided: padding each batch to its own max
    length (a naive port) recompiles per distinct length at ~1 s/compile
    through the remote compile service, and dispatching per batch costs
    ~0.5-1 s per dispatch under tunnel congestion (23 batches for the
    2,924-text corpus — round-4 dispatch diet).  Tokenization stays on
    host; the (n_batches, B, seq) id/mask arrays feed one lax.scan whose
    body is the transformer forward.

    pad_to=0 pads to the tokenizer's max_len (256 — the sentence-
    transformers truncation bound for this model, matching what real FMA
    lyrics mostly hit).  to_host=False returns a device array (on tunneled
    dev devices host readback is the slow direction).
    """
    pad_to = pad_to or tok.max_len
    n = len(texts)
    nb = -(-n // batch_size)
    ids_all = np.full((nb * batch_size, pad_to), tok.pad, np.int32)
    mask_all = np.zeros((nb * batch_size, pad_to), np.float32)
    for s in range(0, n, batch_size):
        ids, mask = tok.encode_batch(texts[s: s + batch_size])
        seq = min(ids.shape[1], pad_to)
        ids_all[s: s + ids.shape[0], :seq] = ids[:, :seq]
        mask_all[s: s + ids.shape[0], :seq] = mask[:, :seq]
    ids3 = ids_all.reshape(nb, batch_size, pad_to)
    mask3 = mask_all.reshape(nb, batch_size, pad_to)

    out = _scan_encode_jit(model)(params, ids3, mask3)
    out = out.reshape(nb * batch_size, -1)[:n]
    return np.asarray(out, np.float32) if to_host else out


def encode_texts_minilm(texts: List[str], model_dir: Path,
                        batch_size: int = 64) -> np.ndarray:
    model, params, tok = load_minilm(model_dir)
    return encode_texts(model, params, tok, texts, batch_size=batch_size)
