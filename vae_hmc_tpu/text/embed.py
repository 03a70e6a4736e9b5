"""Lyrics embedding API with backend fallback chain.

Order (mirrors and extends the reference's sentence-transformers -> TF-IDF
fallback, scripts/18:209-222):
  1. Flax MiniLM with local weights (env VAE_HMC_MINILM_DIR, an explicit
     model_dir argument, or the HF cache) -> (M, 384) normalized — the
     reference's scripts/11 behavior;
  2. TF-IDF (max_features cap, english stop words) — the reference's own
     hard-tier fallback (18:221-222);
  3. 'hashed' 384-d token-hash embedding, L2-normalized — keeps the medium
     tier runnable where the reference would simply crash without
     sentence-transformers; flagged in the returned backend name.
"""
from __future__ import annotations

import hashlib
import os
import re
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from vae_hmc_tpu.core.config import TextEmbedConfig
from vae_hmc_tpu.text.tfidf import TfidfVectorizer

_TOKEN = re.compile(r"(?u)\b\w\w+\b")


def _find_minilm_dir(cfg: TextEmbedConfig) -> Optional[Path]:
    env = os.environ.get("VAE_HMC_MINILM_DIR")
    if env and Path(env).exists():
        return Path(env)
    # HF cache layout
    cache = Path(os.environ.get("HF_HOME", Path.home() / ".cache/huggingface"))
    pat = cfg.model_name.replace("/", "--")
    hub = cache / "hub" / f"models--{pat}" / "snapshots"
    if hub.exists():
        snaps = sorted(hub.iterdir())
        if snaps:
            return snaps[-1]
    return None


def hashed_embedding(texts: List[str], dim: int = 384) -> np.ndarray:
    """Deterministic token-hash bag embedding, L2-normalized."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        for tok in _TOKEN.findall((t or "").lower()):
            h = int.from_bytes(hashlib.blake2b(
                tok.encode(), digest_size=8).digest(), "little")
            sign = 1.0 if (h >> 32) & 1 else -1.0
            out[i, h % dim] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return out / norms


def embed_texts(texts: List[str], cfg: TextEmbedConfig = TextEmbedConfig(),
                model_dir: Optional[Path] = None,
                allow_tfidf: bool = True) -> Tuple[np.ndarray, str]:
    """-> (embeddings (M, D) f32, backend name)."""
    mdir = Path(model_dir) if model_dir else _find_minilm_dir(cfg)
    if mdir is not None:
        try:
            from vae_hmc_tpu.text.minilm import encode_texts_minilm
            emb = encode_texts_minilm(list(texts), mdir, cfg.batch_size)
            return emb, "minilm"
        except Exception:
            pass
    if allow_tfidf:
        vect = TfidfVectorizer(max_features=cfg.tfidf_max_features,
                               stop_words="english")
        emb = vect.fit_transform([t if (t or "").strip() else " "
                                  for t in texts])
        return emb.astype(np.float32), "tfidf"
    return hashed_embedding(list(texts), cfg.embed_dim), "hashed"
