"""Artifact I/O honoring the reference filesystem contract.

The reference's de-facto public API is its file tree: .npy arrays paired with
*_track_ids.npy, metric .csv/.json files, .pt checkpoints, .png plots
(SURVEY.md §1).  This module provides the single implementation of:

- npy/csv/json writers with directory creation,
- the `--tag` snapshot system (reference scripts/19:35-47, 20:20-26, 21:26-32,
  22:36-42: canonical file always overwritten, tagged copy preserved),
- paired array+ids save/load with shape validation (07:40-55 semantics),
- checkpoint save/load (flax params -> npz + json metadata).  The reference
  saves torch .pt checkpoints that nothing loads (SURVEY.md §5); we keep the
  same filenames with .npz payloads and add actual resume support.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Iterable, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Tagged snapshots
# ---------------------------------------------------------------------------


def tagged_path(path: Path, tag: Optional[str]) -> Path:
    """`results/foo.json` + tag 'beta_b4' -> `results/foo_beta_b4.json`.

    Mirrors reference scripts/19:35-38 `tagged_path`.
    """
    path = Path(path)
    if not tag:
        return path
    return path.with_name(f"{path.stem}_{tag}{path.suffix}")


def save_and_snapshot(write_fn, path: Path, tag: Optional[str] = None) -> Path:
    """Write canonical artifact, then an identical tagged copy if tag given.

    Mirrors reference scripts/19:40-47 `save_and_snapshot`: the canonical file
    is always (over)written; the tagged sibling preserves the experiment.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    write_fn(path)
    if tag:
        write_fn(tagged_path(path, tag))
    return path


# ---------------------------------------------------------------------------
# Basic writers
# ---------------------------------------------------------------------------


def save_npy(path: Path, arr: np.ndarray, tag: Optional[str] = None) -> Path:
    arr = np.asarray(arr)
    return save_and_snapshot(lambda p: np.save(p, arr), Path(path), tag)


def save_json(path: Path, obj: Any, tag: Optional[str] = None) -> Path:
    def _w(p: Path):
        p.write_text(json.dumps(obj, indent=2, default=_json_default))
    return save_and_snapshot(_w, Path(path), tag)


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, Path):
        return str(o)
    raise TypeError(f"not json-serializable: {type(o)}")


def save_csv_rows(path: Path, header: Sequence[str],
                  rows: Iterable[Sequence[Any]],
                  tag: Optional[str] = None) -> Path:
    """Plain CSV writer (avoids pandas dependency in the hot path)."""
    rows = [list(r) for r in rows]

    def _w(p: Path):
        with open(p, "w") as f:
            f.write(",".join(map(str, header)) + "\n")
            for r in rows:
                f.write(",".join(_csv_cell(c) for c in r) + "\n")
    return save_and_snapshot(_w, Path(path), tag)


def _csv_cell(c: Any) -> str:
    if isinstance(c, float) or isinstance(c, np.floating):
        return repr(float(c))
    s = str(c)
    if "," in s or '"' in s or "\n" in s:
        s = '"' + s.replace('"', '""') + '"'
    return s


# ---------------------------------------------------------------------------
# Paired feature arrays (the id-alignment schema, SURVEY.md §1)
# ---------------------------------------------------------------------------


def save_features(dir_or_x_path: Path, x: np.ndarray, track_ids: np.ndarray,
                  x_name: Optional[str] = None,
                  ids_name: Optional[str] = None) -> Tuple[Path, Path]:
    """Save `X.npy` + positionally aligned `track_ids.npy`."""
    x = np.asarray(x)
    track_ids = np.asarray(track_ids)
    if x.shape[0] != track_ids.shape[0]:
        raise ValueError(
            f"feature/id length mismatch: {x.shape[0]} vs {track_ids.shape[0]}")
    p = Path(dir_or_x_path)
    if x_name is None:          # p is the X path; ids path derived
        x_path = p
        ids_path = p.with_name(ids_name or _default_ids_name(p.name))
    else:
        x_path = p / x_name
        ids_path = p / (ids_name or _default_ids_name(x_name))
    x_path.parent.mkdir(parents=True, exist_ok=True)
    np.save(x_path, x)
    np.save(ids_path, track_ids)
    return x_path, ids_path


def _default_ids_name(x_name: str) -> str:
    stem = x_name[:-4] if x_name.endswith(".npy") else x_name
    if stem.endswith("_X"):
        stem = stem[:-2]
    return f"{stem}_track_ids.npy"


def load_features(x_path: Path, ids_path: Path) -> Tuple[np.ndarray, np.ndarray]:
    """Load + validate a feature/id pair (reference scripts/07:40-55 checks)."""
    x_path, ids_path = Path(x_path), Path(ids_path)
    if not x_path.exists():
        raise FileNotFoundError(f"missing features: {x_path}")
    if not ids_path.exists():
        raise FileNotFoundError(f"missing track ids: {ids_path}")
    x = np.load(x_path)
    ids = np.load(ids_path, allow_pickle=True)
    if x.shape[0] != ids.shape[0]:
        raise ValueError(
            f"row mismatch {x_path.name}={x.shape[0]} vs {ids_path.name}={ids.shape[0]}")
    return x, ids


# ---------------------------------------------------------------------------
# Checkpoints (params pytree <-> npz)
# ---------------------------------------------------------------------------


def fetch_pytree_single_buffer(tree, chunk_mb: Optional[float] = None):
    """Device pytree -> host pytree via ONE contiguous device->host fetch
    per dtype (leaves are raveled and concatenated by a jitted program,
    fetched once, then split/reshaped on host — bit-exact).

    On links where per-array transfer overhead dominates (the tunneled dev
    chip reads back small-array streams at ~1 MB/s), fetching the conv-MM
    checkpoint's ~20 leaves (342 MB, two 170 MB FC kernels) as one buffer
    is substantially cheaper than np.asarray per leaf (measured round 5:
    17.5 s vs 90.9 s).  Host leaves pass through unchanged.

    chunk_mb: when set, the contiguous buffer is fetched as sequential
    ~chunk_mb-sized slices instead of one transfer.  The tunnel is
    single-stream-saturated (~30-36 MB/s aggregate; concurrency measured
    and refuted round 5), so chunking doesn't raise bandwidth — its point
    is HEAD-OF-LINE FAIRNESS: a background 342 MB fetch otherwise makes
    every concurrent small readback (kmeans labels, silhouette scalars)
    wait for the whole transfer; with chunks, other streams interleave at
    chunk boundaries.  Used by the medium tier's deferred artifact thread,
    which overlaps the cluster/sweep stages.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    device_idx: Dict[Any, list] = {}
    out: list = [None] * len(leaves)
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            device_idx.setdefault(jnp.asarray(leaf).dtype, []).append(i)
        else:
            out[i] = np.asarray(leaf)
    concat = jax.jit(lambda ls: jnp.concatenate([jnp.ravel(x) for x in ls]))
    for dt, idxs in device_idx.items():
        buf = concat([leaves[i] for i in idxs])
        host = _fetch_1d(buf, chunk_mb)
        off = 0
        for i in idxs:
            shape = tuple(np.shape(leaves[i]))
            n = int(np.prod(shape, dtype=np.int64))
            out[i] = host[off:off + n].reshape(shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _fetch_1d(buf, chunk_mb: Optional[float]) -> np.ndarray:
    """Fetch a 1-D device array to host, optionally as sequential chunks.

    Chunk slicing uses ONE jitted dynamic-slice program (row index passed
    as a device scalar) over a padded (n_chunks, chunk) view — per-offset
    Python slicing would bake each start into a separate executable
    (round-3 CODE-SIZE HAZARD)."""
    import jax
    import jax.numpy as jnp

    n = int(buf.shape[0])
    if chunk_mb is None or n * buf.dtype.itemsize <= chunk_mb * 1e6:
        return np.asarray(buf)
    chunk = max(1, int(chunk_mb * 1e6) // buf.dtype.itemsize)
    n_chunks = -(-n // chunk)

    @jax.jit
    def _pad_reshape(b):
        return jnp.concatenate(
            [b, jnp.zeros((n_chunks * chunk - n,), b.dtype)]
        ).reshape(n_chunks, chunk)

    @jax.jit
    def _row(b2, i):
        return jax.lax.dynamic_slice_in_dim(b2, i, 1, axis=0)[0]

    b2 = _pad_reshape(buf)
    host = np.empty((n_chunks * chunk,), dtype=buf.dtype)
    for i in range(n_chunks):
        host[i * chunk:(i + 1) * chunk] = np.asarray(
            _row(b2, jnp.int32(i)))
    return host[:n]


def save_checkpoint(path: Path, params, metadata: Optional[Dict] = None,
                    tag: Optional[str] = None) -> Path:
    """Flatten a pytree of arrays into one .npz + metadata json sidecar.

    Replaces the reference's torch.save state_dict checkpoints (06:347,
    12:281-285, 19:248-264) with a framework-neutral format; unlike the
    reference, `load_checkpoint` actually restores it (resume support).
    """
    import jax

    leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    flat = {}
    for kp, leaf in leaves_with_paths:
        key = "/".join(_keystr(k) for k in kp)
        flat[key] = np.asarray(leaf)

    def _w(p: Path):
        # write through a file handle so np.savez cannot append '.npz' —
        # the contract filename may be e.g. 'vae_basic.pt' (ref 06:347)
        with open(p, "wb") as f:
            np.savez(f, **flat)
        meta_p = p.with_suffix(p.suffix + ".meta.json")
        meta_p.write_text(json.dumps(metadata or {}, indent=2, default=_json_default))
    return save_and_snapshot(_w, Path(path), tag)


def _keystr(k) -> str:
    import jax
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return str(k.name)
    return str(k)


def load_checkpoint(path: Path, like=None):
    """Load a checkpoint saved by `save_checkpoint`.

    If `like` (a pytree template with the same structure) is given, arrays are
    re-nested into that structure; otherwise a flat {path: array} dict plus the
    metadata dict is returned.
    """
    import jax

    path = Path(path)
    data = dict(np.load(path, allow_pickle=False))
    meta_p = path.with_suffix(path.suffix + ".meta.json")
    metadata = json.loads(meta_p.read_text()) if meta_p.exists() else {}
    if like is None:
        return data, metadata
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for kp, leaf in leaves_with_paths:
        key = "/".join(_keystr(k) for k in kp)
        if key not in data:
            raise KeyError(f"checkpoint missing param {key}")
        arr = data[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), metadata
