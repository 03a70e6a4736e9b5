"""First-party TF-IDF vectorizer with sklearn TfidfVectorizer semantics.

Used as the hard tier's text-embedding fallback (reference scripts/18:221-222:
TfidfVectorizer(max_features=2000, stop_words='english')).  Reproduces the
sklearn defaults that matter for parity:
  - lowercase, token_pattern r'(?u)\\b\\w\\w+\\b' (>=2 word chars), unigrams;
  - vocabulary sorted alphabetically; max_features keeps the top terms by
    corpus-wide term frequency;
  - smooth idf: ln((1+n)/(1+df)) + 1;  tf = raw counts;  l2 row norm.
Tested against sklearn on the same corpus (tests/test_text.py).
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np

_TOKEN = re.compile(r"(?u)\b\w\w+\b")

# sklearn's built-in english stop word list (frozen set, reproduced verbatim
# from sklearn.feature_extraction.text.ENGLISH_STOP_WORDS so the fallback
# matches reference behavior without importing sklearn at runtime).
try:  # prefer the real list when sklearn is present (it is, in dev/test envs)
    from sklearn.feature_extraction.text import ENGLISH_STOP_WORDS as _STOP
except Exception:  # pragma: no cover
    _STOP = frozenset("a an and are as at be by for from has he in is it its "
                      "of on that the to was were will with".split())


class TfidfVectorizer:
    def __init__(self, max_features: Optional[int] = None,
                 stop_words: Optional[str] = None):
        self.max_features = max_features
        self.stop_words = _STOP if stop_words == "english" else None
        self.vocabulary_: Dict[str, int] = {}
        self.idf_: Optional[np.ndarray] = None

    def _tokenize(self, doc: str) -> List[str]:
        toks = _TOKEN.findall(doc.lower())
        if self.stop_words is not None:
            toks = [t for t in toks if t not in self.stop_words]
        return toks

    def fit_transform(self, docs: Sequence[str]) -> np.ndarray:
        n = len(docs)
        counts: List[Dict[str, int]] = []
        tf_total: Dict[str, int] = {}
        df: Dict[str, int] = {}
        for d in docs:
            c: Dict[str, int] = {}
            for t in self._tokenize(d):
                c[t] = c.get(t, 0) + 1
            counts.append(c)
            for t, k in c.items():
                tf_total[t] = tf_total.get(t, 0) + k
                df[t] = df.get(t, 0) + 1
        terms = sorted(tf_total)
        if self.max_features is not None and len(terms) > self.max_features:
            # top-k by corpus term frequency (sklearn _limit_features)
            ranked = sorted(terms, key=lambda t: (-tf_total[t], t))
            keep = set(ranked[: self.max_features])
            terms = [t for t in terms if t in keep]
        self.vocabulary_ = {t: i for i, t in enumerate(terms)}
        self.idf_ = np.log((1.0 + n) / (1.0 + np.asarray(
            [df[t] for t in terms], dtype=np.float64))) + 1.0
        return self._transform_counts(counts)

    def transform(self, docs: Sequence[str]) -> np.ndarray:
        counts = []
        for d in docs:
            c: Dict[str, int] = {}
            for t in self._tokenize(d):
                if t in self.vocabulary_:
                    c[t] = c.get(t, 0) + 1
            counts.append(c)
        return self._transform_counts(counts)

    def _transform_counts(self, counts) -> np.ndarray:
        m = len(self.vocabulary_)
        x = np.zeros((len(counts), m), dtype=np.float64)
        for i, c in enumerate(counts):
            for t, k in c.items():
                j = self.vocabulary_.get(t)
                if j is not None:
                    x[i, j] = k
        x *= self.idf_[None, :]
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return (x / norms).astype(np.float32)
