"""Fused training engine for the VAE family.

Design (vs the reference's torch loops, scripts 06:316-344, 12:246-287,
19:210-245, 22:146-171):
  - the full feature set is HBM-resident (largest: the (N,128,646,1) mel
    tensor, ~0.9 GB) — there is no DataLoader; minibatches are index gathers
    out of the resident array inside a lax.scan over the epoch;
  - one jitted epoch program: shuffle (jax.random.permutation) -> scan over
    full batches -> remainder batch as a second, separately-compiled step
    (keeps DataLoader drop_last=False semantics of the reference);
  - reparameterize + ELBO + backward + Adam update fuse into a single XLA
    program per step; donated params avoid HBM copies;
  - per-epoch history rows {epoch, total, recon, kl} match the reference's
    logging contract (06:312-351 history.json, 12:238-241 train_log.csv);
  - optional multi-device data parallelism: pass a Mesh and the batch gather
    shards over the 'data' axis with gradient psum inserted by XLA
    (vae_hmc_tpu.parallel.mesh) — the reference has no DP at all
    (SURVEY.md §2c).
  - optional KL annealing (linear beta warm-up), the hard tier's schedule
    knob (BASELINE.json config 4); reference trains with constant beta.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_hmc_tpu.models.losses import elbo_loss


@dataclass
class FitResult:
    params: Any
    history: List[Dict[str, float]]     # one row per epoch


def _beta_at(beta: float, epoch: int, anneal_epochs: int) -> float:
    if anneal_epochs and anneal_epochs > 0:
        return beta * min(1.0, (epoch + 1) / anneal_epochs)
    return beta


def _flatten_for_gather(arrays):
    """(arrays) -> (flats, tails): 2-D views for per-step row gathers.

    Dynamic row gathers out of >2-D arrays (the (N, 128, 646, 1) mel
    tensor) lower ~8x slower on TPU than the same gather on a
    (N, features) 2-D view — the trailing unit dim wastes the (8, 128)
    tile lanes.  Gathered batches reshape back via `tails` (a cheap
    on-device relayout).  Shared by fit() and encode_in_batches so the
    layout rule lives in one place.
    """
    n = int(arrays[0].shape[0])
    tails = tuple(a.shape[1:] for a in arrays)
    flats = tuple(a.reshape(n, -1) if a.ndim > 2 else a for a in arrays)
    return flats, tails


GATHER_BUFFER_BOUNDARY = 2 ** 31    # bytes; v5e single-buffer gather limit


def _chunk_boundary() -> Optional[int]:
    """Per-device-buffer byte boundary for row-gather chunking, or None when
    chunking is off (non-TPU platforms gather fine past 2^31).

    VAE_HMC_GATHER_CHUNK_BYTES overrides (tests set it tiny on CPU to
    exercise the chunked programs); VAE_HMC_ALLOW_BIG_BUFFER=1 disables
    chunking entirely (runtimes with 64-bit buffer addressing)."""
    import os as _os
    if _os.environ.get("VAE_HMC_ALLOW_BIG_BUFFER"):
        return None
    env = _os.environ.get("VAE_HMC_GATHER_CHUNK_BYTES")
    if env:
        return int(env)
    if jax.devices()[0].platform == "tpu":
        return GATHER_BUFFER_BOUNDARY
    return None


def _chunk_cuts(n: int, nbytes: int, n_shards: int, bound: Optional[int],
                shape=None):
    """Pure shape math behind _chunk_rows: starting row offsets for the
    fewest even row chunks whose per-shard bytes stay STRICTLY under the
    gather boundary (the crash threshold is >=).  (0,) means un-chunked.
    Shared with prepare_fit, which plans chunks from ShapeDtypeStructs
    before any real array exists."""
    if bound is None or nbytes / n_shards < bound:
        return (0,)
    row_bytes = max(nbytes // max(n, 1), 1)
    n_chunks = int(nbytes) // (bound * n_shards) + 1
    while True:
        per = -(-n // n_chunks)
        per += (-per) % n_shards            # align up to the data axis
        if per * row_bytes < bound * n_shards:
            break
        if per <= n_shards:                  # smallest aligned chunk
            raise ValueError(
                f"array {tuple(shape) if shape is not None else (n, '...')} "
                f"cannot be row-chunked under the {bound}-byte per-device "
                "gather boundary (a single per-shard row group already "
                "crosses it); shard over more 'data'-axis devices")
        n_chunks += 1
    return tuple(range(0, n, per))


def _chunk_rows(flats, mesh):
    """Split oversize resident arrays into row-contiguous chunks that each
    stay under the single-buffer gather boundary PER DEVICE SHARD.

    Per-step row gathers from one device buffer past 2^31 bytes CRASH the
    TPU worker (round-2 measured: 8,000x(128,646) f32 = 2.64 GiB faults;
    1.98 GiB is fine).  Until round 5 fit() simply refused such datasets
    single-chip; splitting the GATHER SOURCE into even row chunks (total
    HBM unchanged) lifts the envelope — each step then runs one small
    row gather per chunk plus (n_chunks-1) selects, exact ops, so results
    are bit-identical to the single-buffer program.

    Returns (chunked, offsets): chunked[i] is a tuple of >=1 arrays
    (un-chunked arrays pass through as 1-tuples of the ORIGINAL buffer —
    no copy, and the single-chunk gather path emits the exact pre-round-5
    HLO, preserving persistent-compile-cache hits); offsets[i] is the
    matching static tuple of starting row indices.  Chunk row counts stay
    divisible by the mesh 'data' axis so every chunk shards P('data')."""
    bound = _chunk_boundary()
    chunked, offsets = [], []
    for fa in flats:
        if mesh is not None:
            n_shards = int(mesh.shape.get("data", 1))
        else:
            # a caller-sharded P('data') array (encode after dp_fit) is
            # already under the boundary per shard — count its shards
            spec = getattr(getattr(fa, "sharding", None), "spec", None)
            m = getattr(getattr(fa, "sharding", None), "mesh", None)
            n_shards = (int(m.shape.get("data", 1))
                        if m is not None and spec is not None and len(spec)
                        and spec[0] == "data" else 1)
        n = int(fa.shape[0])
        cuts = _chunk_cuts(n, int(fa.nbytes), n_shards, bound,
                           shape=fa.shape)
        if cuts == (0,):
            chunked.append((fa,))
            offsets.append((0,))
            continue
        per = cuts[1]
        chunked.append(tuple(fa[lo:lo + per] for lo in cuts))
        offsets.append(tuple(cuts))
    return tuple(chunked), tuple(offsets)


def _gather_rows(chunks, offs, idx):
    """Row-gather `idx` out of a (possibly chunked) resident array.

    Single chunk: the exact pre-chunking gather (`chunks[0][idx]`) — same
    HLO, same compiled program.  Multi-chunk: one clamped 1-D row gather
    per chunk (plain 1-D row gathers are the ~0.2 MB-program fast layout,
    VALIDATION round-3 table) stitched with exact `where` selects, so the
    result is bit-identical to gathering from one giant buffer."""
    if len(chunks) == 1:
        return chunks[0][idx]
    out = chunks[0][jnp.minimum(idx, chunks[0].shape[0] - 1)]
    for c, off in zip(chunks[1:], offs[1:]):
        local = jnp.clip(idx - off, 0, c.shape[0] - 1)
        sel = (idx >= off).reshape((-1,) + (1,) * (out.ndim - 1))
        out = jnp.where(sel, c[local], out)
    return out


def oversize_gather_buffers(flats, mesh) -> List[str]:
    """Arrays whose PER-DEVICE resident shard would cross the 2^31-byte
    single-buffer gather boundary (round-2 measured TPU-worker crash).

    With a mesh the rows shard over 'data', so the boundary applies to
    nbytes / data_axis_size, not the global array — the scale envelope
    grows linearly with the data axis (N=8,000 mel rows crash single-chip
    at 2.64 GiB but fit 2 ways at 1.32 GiB/shard)."""
    n_shards = 1 if mesh is None else int(mesh.shape.get("data", 1))
    return [f"{tuple(fa.shape)} = {fa.nbytes / 2**30:.2f} GiB"
            + (f" ({n_shards}-way sharded)" if n_shards > 1 else "")
            for fa in flats
            if fa.nbytes / n_shards >= GATHER_BUFFER_BOUNDARY]


# --------------------------------------------------------------------------
# Fused fast-path program construction, shared by fit() and prepare_fit().
# These factories close over SHAPES AND HYPERPARAMETERS ONLY — no data — so
# the exact training program fit() runs can be traced, lowered and compiled
# before the feature arrays exist (prepare_fit), overlapping the ~2 s Python
# trace + compile-cache load with upstream pipeline stages.  fit() composes
# the same factories, so both paths trace ONE Python structure: the prepared
# executable is the fast path's program, not a reimplementation.
# --------------------------------------------------------------------------


def _make_gather_batch(tails, chunk_offsets, shard_batch):
    def gather_batch(arrs, idx):
        batch = tuple(
            _gather_rows(chunks, offs, idx).reshape((idx.shape[0],) + tail)
            if len(tail) > 1 else _gather_rows(chunks, offs, idx)
            for chunks, offs, tail in zip(arrs, chunk_offsets, tails))
        return shard_batch(batch)
    return gather_batch


def _make_step(apply_fn, tx, *, target_idx, reduction, variational, cast):
    def loss_fn(p, rng, batch, beta_now):
        # the LOSS target stays full f32 — only the model input casts down
        # (round-tripping the target through bf16 would quantize the recon
        # reference to an 8-bit mantissa for no benefit)
        target_f32 = batch[target_idx].astype(jnp.float32)
        if cast is not None:
            p = jax.tree_util.tree_map(
                lambda w: w.astype(cast) if w.dtype == jnp.float32 else w, p)
            batch = tuple(b.astype(cast) if b.dtype == jnp.float32 else b
                          for b in batch)
        out = apply_fn(p, rng, *batch)
        if variational:
            xhat, mu, logvar = out
            loss, aux = elbo_loss(xhat.astype(jnp.float32),
                                  target_f32,
                                  mu.astype(jnp.float32),
                                  logvar.astype(jnp.float32),
                                  beta_now, reduction)
        else:
            xhat = out[0] if isinstance(out, tuple) else out
            loss = jnp.mean((xhat.astype(jnp.float32) - target_f32) ** 2)
            aux = {"recon": loss, "kl": jnp.zeros(()), "total": loss}
        return loss, aux

    def step(p, opt_state, rng, batch, beta_now):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, rng, batch, beta_now)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, aux

    return step


def _make_train_all(step, gather_batch, *, n, n_full, rem, batch_size,
                    epochs, perm_tag):
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_all(p, opt_state, arrs, root, betas):
        keys = jax.vmap(lambda e: jax.random.fold_in(root, e))(
            jnp.arange(epochs))
        perm_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, perm_tag))(keys)
        perms = jax.vmap(lambda k: jax.random.permutation(k, n))(
            perm_keys)

        def epoch_body(carry, inp):
            p, opt_state = carry
            perm, beta_now, ekey = inp
            perm_full = perm[: n_full * batch_size].reshape(
                n_full, batch_size)

            def body(c, xs):
                p, opt_state = c
                i, idx = xs
                batch = gather_batch(arrs, idx)
                rng = jax.random.fold_in(ekey, i)
                p, opt_state, aux = step(p, opt_state, rng, batch,
                                         beta_now)
                return (p, opt_state), jnp.stack(
                    [aux["total"], aux["recon"], aux["kl"]])

            (p, opt_state), metrics = jax.lax.scan(
                body, (p, opt_state), (jnp.arange(n_full), perm_full))
            tot = jnp.sum(metrics, axis=0) * batch_size
            if rem:
                ridx = perm[n_full * batch_size:]
                batch = gather_batch(arrs, ridx)
                rng = jax.random.fold_in(ekey, n_full)
                p, opt_state, aux = step(p, opt_state, rng, batch,
                                         beta_now)
                tot = tot + jnp.stack(
                    [aux["total"], aux["recon"], aux["kl"]]) * rem
            return (p, opt_state), tot / n

        (p, opt_state), hist = jax.lax.scan(
            epoch_body, (p, opt_state), (perms, betas, keys))
        return p, opt_state, hist

    return train_all


def _fit_fingerprint(flat_shapes_dtypes, chunk_offsets, **hyper):
    """Static identity of the fused fast-path program: the flattened array
    layout + chunk plan + every trace-affecting hyperparameter.  A prepared
    executable may only run where fingerprints match EXACTLY — a silent
    shape/hyperparameter drift would execute the wrong program."""
    return (tuple(flat_shapes_dtypes), tuple(chunk_offsets),
            tuple(sorted(hyper.items())))


@dataclass
class PreparedFit:
    """AOT-prepared fused trainer: fresh (params, opt_state) device buffers
    plus the compiled fast-path train_all executable.  SINGLE USE — the
    executable donates params/opt_state on execution.  Built by
    prepare_fit(); consumed by fit(..., prepared=...)."""
    params: Any
    opt_state: Any
    compiled: Any
    root: Any
    betas: np.ndarray
    fingerprint: tuple


def prepare_fit(
    apply_fn: Callable,
    params,
    array_specs: Sequence[Any],          # jax.ShapeDtypeStruct per array
    *,
    epochs: int,
    batch_size: int,
    learning_rate: float,
    beta: float = 1.0,
    reduction: str = "mean",
    seed: int = 42,
    kl_anneal_epochs: int = 0,
    variational: bool = True,
    compute_dtype: Optional[str] = None,
) -> PreparedFit:
    """Build fit()'s fused fast-path program from SHAPES alone.

    Training setup costs real wall time on a remote-attached device —
    jitted model/optimizer init dispatch, the ~2 s Python trace of the
    epoch-scan program, the compile (or persistent-cache load) — and none
    of it needs the data, only shapes.  prepare_fit runs all of it, so a
    pipeline can overlap training setup with feature extraction (bench.py
    stage 1-2) and then call fit(..., prepared=...) the moment features
    land.  The prepared path is bit-identical to the plain path by
    construction: identical init program, identical seeds, and the SAME
    train_all Python structure (shared factories above) — only the wall
    clock moves (tests/test_prepared_fit.py pins bit-identity).

    Single-device only (fit(mesh=...) covers SPMD); checkpointing/verbose
    use fit's incremental path, which has nothing to prepare.
    """
    n = int(array_specs[0].shape[0])
    tails = tuple(tuple(s.shape[1:]) for s in array_specs)
    flat_specs = tuple(
        jax.ShapeDtypeStruct(
            (n, int(np.prod(s.shape[1:], dtype=np.int64)))
            if len(s.shape) > 2 else tuple(s.shape), s.dtype)
        for s in array_specs)
    bound = _chunk_boundary()
    chunk_offsets, chunk_specs = [], []
    for fs in flat_specs:
        nbytes = int(np.prod(fs.shape, dtype=np.int64)
                     * jnp.dtype(fs.dtype).itemsize)
        cuts = _chunk_cuts(n, nbytes, 1, bound, shape=fs.shape)
        per = cuts[1] if len(cuts) > 1 else n
        chunk_offsets.append(cuts)
        chunk_specs.append(tuple(
            jax.ShapeDtypeStruct((min(per, n - lo),) + tuple(fs.shape[1:]),
                                 fs.dtype) for lo in cuts))
    chunk_offsets, chunk_specs = tuple(chunk_offsets), tuple(chunk_specs)

    tx = optax.adam(learning_rate)
    # fresh param buffers + optimizer init as ONE jitted program (same as
    # fit's) — dispatched NOW, so the device fills the Adam moments while
    # upstream stages run
    params, opt_state = jax.jit(
        lambda p: (jax.tree_util.tree_map(jnp.array, p), tx.init(p)))(params)
    cast = (jnp.bfloat16 if compute_dtype in ("bf16", "bfloat16") else None)
    step = _make_step(apply_fn, tx, target_idx=0, reduction=reduction,
                      variational=variational, cast=cast)
    gather_batch = _make_gather_batch(tails, chunk_offsets,
                                      lambda batch: batch)
    n_full = n // batch_size
    rem = n - n_full * batch_size
    perm_tag = max(7919, n_full + 1)
    train_all = _make_train_all(step, gather_batch, n=n, n_full=n_full,
                                rem=rem, batch_size=batch_size,
                                epochs=epochs, perm_tag=perm_tag)
    betas = np.asarray([_beta_at(beta, e, kl_anneal_epochs)
                        for e in range(epochs)], np.float32)
    root = jax.random.PRNGKey(seed)
    compiled = train_all.lower(params, opt_state, chunk_specs, root,
                               betas).compile()
    fp = _fit_fingerprint(
        tuple((tuple(fs.shape), jnp.dtype(fs.dtype).name)
              for fs in flat_specs),
        chunk_offsets,
        n=int(n), epochs=int(epochs), batch_size=int(batch_size),
        learning_rate=float(learning_rate), beta=float(beta),
        reduction=reduction, seed=int(seed),
        kl_anneal_epochs=int(kl_anneal_epochs),
        variational=bool(variational),
        compute_dtype=compute_dtype or "float32")
    return PreparedFit(params=params, opt_state=opt_state, compiled=compiled,
                       root=root, betas=betas, fingerprint=fp)


def fit(
    apply_fn: Callable,                  # (params, rng, *batch_arrays) -> (xhat, mu, logvar) | (xhat, None, None)
    params,
    arrays: Sequence[jnp.ndarray],       # batch-axis-aligned inputs; arrays[0] is the recon target
    *,
    epochs: int,
    batch_size: int,
    learning_rate: float,
    beta: float = 1.0,
    reduction: str = "mean",
    seed: int = 42,
    kl_anneal_epochs: int = 0,
    variational: bool = True,
    log_every: int = 1,
    verbose: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    mesh=None,                           # jax Mesh -> DP over 'data' (+ TP
    param_shardings=None,                # via the caller's sharding tree)
    compute_dtype: Optional[str] = None,  # "bfloat16" -> mixed precision
    n_rows: Optional[int] = None,        # valid rows if arrays carry padding
    prepared: Optional[PreparedFit] = None,  # prepare_fit() handle (AOT)
) -> FitResult:
    """Single fused trainer for 1 device and for device meshes.

    With `mesh`, the SAME program runs SPMD: the dataset rows shard over the
    mesh's 'data' axis (HBM use scales down per device), every minibatch is
    sharding-constrained over 'data' so forward/backward compute shards, and
    the gradient/loss reductions become XLA-inserted psums over ICI.  Params
    are replicated unless `param_shardings` marks kernels for tensor
    parallelism (parallel.mesh).  Batch composition, RNG streams, epoch
    schedule and history arithmetic are IDENTICAL to the single-device path
    — mesh training is step-equivalent to fit() by construction, not by a
    parallel reimplementation (the reference has no DP at all, SURVEY §2c).
    """
    if n_rows is None:
        # Guard (advisor round 3): multihost staging (global_batch_from_local
        # / stage_features_sharded) returns P('data') arrays whose leading
        # dim may be PADDED with zero rows; treating shape[0] as the row
        # count would silently train on the padding.  A pre-sharded 'data'
        # array therefore requires an explicit n_rows.
        spec = getattr(getattr(arrays[0], "sharding", None), "spec", None)
        if spec is not None and len(spec) and spec[0] == "data":
            raise ValueError(
                "arrays[0] is already sharded P('data') — staged arrays may "
                "carry zero-row padding (parallel.multihost.padded_rows); "
                "pass n_rows=<valid row count> explicitly")
    if prepared is not None and (mesh is not None
                                 or checkpoint_dir is not None or verbose):
        raise ValueError(
            "prepared fit covers only the single-device fused fast path "
            "(no mesh / checkpointing / verbose — those paths have nothing "
            "AOT-preparable)")
    n = int(arrays[0].shape[0]) if n_rows is None else int(n_rows)
    arrays = tuple(jnp.asarray(a) for a in arrays)
    target_idx = 0
    flats, tails = _flatten_for_gather(arrays)

    if mesh is not None:
        # A P('data') resident array needs its leading dim divisible by the
        # data axis (uneven NamedSharding arrays cannot be constructed —
        # parallel.multihost.padded_rows).  Pad with zero rows; the batch
        # gathers only ever index rows < n so the padding is never trained.
        n_data = int(mesh.shape.get("data", 1))
        cur = int(flats[0].shape[0])
        pad = (-cur) % n_data
        if pad:
            flats = tuple(
                jnp.concatenate(
                    [fa, jnp.zeros((pad,) + fa.shape[1:], fa.dtype)])
                for fa in flats)

    # Single-buffer addressing boundary (measured on v5e): per-step row
    # gathers from one device buffer past 2^31 bytes CRASH the TPU worker
    # (8,000x(128,646) f32 = 2.64 GB faults; 6,000 = 1.98 GB is fine).
    # Round 5: instead of refusing single-chip, oversize datasets are
    # auto-split into even row chunks (each strictly under the boundary
    # per device shard) and gathered chunk-wise — bit-identical results,
    # sub-0.1 ms/step extra.  A mesh additionally shards rows over 'data'
    # (per-shard footprint |data|/n_data), so chunking only engages when
    # even the per-shard view crosses the boundary.
    flat_sd = tuple((tuple(f.shape), jnp.dtype(f.dtype).name) for f in flats)
    flats, chunk_offsets = _chunk_rows(flats, mesh)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(mesh, P("data"))
        # dataset rows sharded over 'data': per-device HBM footprint is
        # |data|/n_data; the per-step row gather crosses shards via one
        # small XLA-inserted collective (batch-sized, rides ICI)
        flats = tuple(
            tuple(jax.device_put(c, NamedSharding(mesh, P("data")))
                  for c in chunks)
            for chunks in flats)
        if param_shardings is None:
            param_shardings = jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), params)
        params = jax.tree_util.tree_map(jax.device_put, params,
                                        param_shardings)

        def shard_batch(batch):
            return tuple(jax.lax.with_sharding_constraint(b, batch_sharding)
                         for b in batch)
    else:
        def shard_batch(batch):
            return batch

    gather_batch = _make_gather_batch(tails, chunk_offsets, shard_batch)

    tx = optax.adam(learning_rate)
    if prepared is not None:
        # prepare_fit already ran the init-buffers program — re-running it
        # here would burn a dispatch and copy the (possibly ~342 MB) params
        params, opt_state = prepared.params, prepared.opt_state
    else:
        # ONE jitted program: fresh param buffers (the epoch programs donate
        # them, which would otherwise delete the caller's pytree) + optimizer
        # init.  Eagerly this is ~70 tiny dispatches — measurable per-op
        # latency on remote-attached devices.
        params, opt_state = jax.jit(
            lambda p: (jax.tree_util.tree_map(jnp.array, p),
                       tx.init(p)))(params)
    root = jax.random.PRNGKey(seed)

    # Mixed precision (TPU-native default for the conv model): forward +
    # backward run in bfloat16 — halved activation HBM traffic, MXU-native
    # inputs — while master params, Adam moments and the loss/KL reductions
    # stay float32.  Gradients exit the cast boundary as float32
    # (d(astype)/dx is astype back), so the optimizer math is exact f32.
    cast = (jnp.bfloat16 if compute_dtype in ("bf16", "bfloat16")
            else None)

    step = _make_step(apply_fn, tx, target_idx=target_idx,
                      reduction=reduction, variational=variational,
                      cast=cast)

    n_full = n // batch_size
    rem = n - n_full * batch_size
    # permutation-key tag: must be DISJOINT from the per-step
    # fold_in(ekey, i) stream (i in 0..n_full).  7919 is kept verbatim
    # below that step count so every published trajectory is unchanged;
    # past it the tag moves above the step range instead of reusing step
    # 7919's key for the shuffle.
    perm_tag = max(7919, n_full + 1)

    # `arrs` is an explicit jit argument (NOT a closure capture): closure
    # device arrays are baked into the executable as constants, which would
    # duplicate the ~GB-scale mel tensor at compile time.
    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_full(p, opt_state, arrs, perm_full, epoch_key, beta_now):
        """scan over the n_full full batches; perm_full: (n_full, B)."""
        def body(carry, inp):
            p, opt_state = carry
            i, idx = inp
            batch = gather_batch(arrs, idx)
            rng = jax.random.fold_in(epoch_key, i)
            p, opt_state, aux = step(p, opt_state, rng, batch, beta_now)
            return (p, opt_state), jnp.stack(
                [aux["total"], aux["recon"], aux["kl"]])
        (p, opt_state), metrics = jax.lax.scan(
            body, (p, opt_state), (jnp.arange(n_full), perm_full))
        return p, opt_state, metrics

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_rem(p, opt_state, arrs, idx, epoch_key, beta_now):
        batch = gather_batch(arrs, idx)
        rng = jax.random.fold_in(epoch_key, n_full)
        p, opt_state, aux = step(p, opt_state, rng, batch, beta_now)
        return p, opt_state, jnp.stack(
            [aux["total"], aux["recon"], aux["kl"]])

    # Fast path: no checkpointing requested -> ONE jitted program scans over
    # every epoch (shuffle, full batches, remainder, beta schedule all
    # inside).  One compile, one dispatch, one history fetch — versus 2*E
    # host round trips of the incremental path, which matter when the host
    # link has high latency (and always cost dispatch overhead).
    if checkpoint_dir is None and not verbose:
        # betas computed on host (np): uploading an argument is not a
        # dispatch; keys/perms derive from `root` INSIDE the program —
        # the eager vmap trio here used to cost ~6 small dispatches per
        # fit() (~0.5-1 s each under tunnel congestion), and the values
        # are bit-identical computed jitted or eager
        betas = np.asarray([_beta_at(beta, e, kl_anneal_epochs)
                            for e in range(epochs)], np.float32)

        if prepared is not None:
            fp = _fit_fingerprint(
                flat_sd, chunk_offsets,
                n=int(n), epochs=int(epochs), batch_size=int(batch_size),
                learning_rate=float(learning_rate), beta=float(beta),
                reduction=reduction, seed=int(seed),
                kl_anneal_epochs=int(kl_anneal_epochs),
                variational=bool(variational),
                compute_dtype=compute_dtype or "float32")
            if fp != prepared.fingerprint:
                raise ValueError(
                    "prepared fit fingerprint mismatch — the AOT executable "
                    "was built for a different array layout or hyperparam "
                    f"set:\n  prepared: {prepared.fingerprint}\n"
                    f"  this call: {fp}")
            params, opt_state, hist = prepared.compiled(
                params, opt_state, flats, root, betas)
            hist = np.asarray(hist)
            return FitResult(params=params, history=[
                {"epoch": e + 1, "total": float(hist[e, 0]),
                 "recon": float(hist[e, 1]), "kl": float(hist[e, 2])}
                for e in range(epochs)])

        train_all = _make_train_all(step, gather_batch, n=n, n_full=n_full,
                                    rem=rem, batch_size=batch_size,
                                    epochs=epochs, perm_tag=perm_tag)

        import os as _os
        import time as _time
        _dbg = _os.environ.get("VAE_HMC_DEBUG_TIMING")
        if _dbg:
            _t0 = _time.perf_counter()
            lowered = train_all.lower(params, opt_state, flats, root, betas)
            print(f"[fit] trace+lower {_time.perf_counter() - _t0:.1f}s",
                  flush=True)
            _t0 = _time.perf_counter()
            compiled = lowered.compile()
            print(f"[fit] compile {_time.perf_counter() - _t0:.1f}s",
                  flush=True)
            _t0 = _time.perf_counter()
            params, opt_state, hist = compiled(params, opt_state, flats,
                                               root, betas)
            jax.block_until_ready(hist)
            print(f"[fit] execute-dispatch {_time.perf_counter() - _t0:.1f}s"
                  " (block_until_ready is unreliable on tunneled devices;"
                  " the history-fetch line is the real execute bound)",
                  flush=True)
        else:
            params, opt_state, hist = train_all(params, opt_state, flats,
                                                root, betas)
        if _dbg:
            _t0 = _time.perf_counter()
        hist = np.asarray(hist)
        if _dbg:
            print(f"[fit] history fetch (= execute on async platforms) "
                  f"{_time.perf_counter() - _t0:.1f}s", flush=True)
        history = [
            {"epoch": e + 1, "total": float(hist[e, 0]),
             "recon": float(hist[e, 1]), "kl": float(hist[e, 2])}
            for e in range(epochs)
        ]
        return FitResult(params=params, history=history)

    # Checkpoint/resume: the reference saves per-epoch checkpoints nothing
    # ever loads (12:281-285; SURVEY.md §5 "save-only, never load-to-resume").
    # Here a crash mid-train resumes from the last saved (params, opt_state,
    # epoch, history) instead of restarting from scratch.
    history: List[Dict[str, float]] = []
    start_epoch = 0
    ckpt_path = None
    if checkpoint_dir is not None:
        from pathlib import Path as _P

        from vae_hmc_tpu.core import artifacts as _art

        ckpt_path = _P(checkpoint_dir) / "train_state.ckpt"
        if resume and ckpt_path.exists():
            flat, meta = _art.load_checkpoint(ckpt_path,
                                              like=(params, opt_state))
            params, opt_state = flat
            start_epoch = int(meta.get("epoch", 0))
            history = list(meta.get("history", []))

    for epoch in range(start_epoch, epochs):
        ekey = jax.random.fold_in(root, epoch)
        perm = jax.random.permutation(jax.random.fold_in(ekey, perm_tag),
                                      n)
        beta_now = jnp.asarray(_beta_at(beta, epoch, kl_anneal_epochs),
                               jnp.float32)
        totals = np.zeros(3)
        params, opt_state, metrics = epoch_full(
            params, opt_state, flats,
            perm[: n_full * batch_size].reshape(n_full, batch_size),
            ekey, beta_now)
        m = np.asarray(metrics)
        totals += m.sum(axis=0) * batch_size
        if rem:
            params, opt_state, aux = epoch_rem(
                params, opt_state, flats, perm[n_full * batch_size:],
                ekey, beta_now)
            totals += np.asarray(aux) * rem
        avg = totals / n
        row = {"epoch": epoch + 1, "total": float(avg[0]),
               "recon": float(avg[1]), "kl": float(avg[2])}
        history.append(row)
        if verbose and ((log_every and epoch % log_every == 0)
                        or epoch == epochs - 1):
            print(f"[epoch {epoch + 1:3d}/{epochs}] "
                  f"total {row['total']:.4f} recon {row['recon']:.4f} "
                  f"kl {row['kl']:.4f}")
        if (ckpt_path is not None and checkpoint_every
                and (epoch + 1) % checkpoint_every == 0):
            from vae_hmc_tpu.core import artifacts as _art
            _art.save_checkpoint(ckpt_path, (params, opt_state),
                                 metadata={"epoch": epoch + 1,
                                           "history": history})
    return FitResult(params=params, history=history)


def encode_in_batches(
    encode_fn: Callable,                 # (params, *batch_arrays) -> latents
    params,
    arrays: Sequence[jnp.ndarray],
    batch_size: int = 512,
    to_host: bool = True,
    n_rows: Optional[int] = None,        # valid rows if arrays carry padding
):
    """Full-set posterior-mean export (reference scripts/06:354-360,
    12:289-309, 19:268-287 latent dumps).

    ONE jitted program: a lax.scan over clamped-index batches (the tail
    batch re-encodes trailing rows, then the final slice drops them), so
    the export costs one dispatch and — with to_host — one small (N, d)
    fetch, instead of ceil(N/B) dispatch+fetch round trips (each ~seconds
    on remote-attached devices).  to_host=False keeps the latents
    HBM-resident for downstream device clustering."""
    if n_rows is None:
        # same staged-padding guard as fit() — exported latents would
        # otherwise include rows for the zero padding
        spec = getattr(getattr(arrays[0], "sharding", None), "spec", None)
        if spec is not None and len(spec) and spec[0] == "data":
            raise ValueError(
                "arrays[0] is already sharded P('data') — staged arrays may "
                "carry zero-row padding; pass n_rows=<valid row count>")
    n = int(arrays[0].shape[0]) if n_rows is None else int(n_rows)
    arrays = tuple(jnp.asarray(a) for a in arrays)
    flats, tails = _flatten_for_gather(arrays)
    # same oversize-buffer chunking as fit() (the export gathers rows out
    # of the same resident buffers the trainer does)
    flats, chunk_offsets = _chunk_rows(flats, None)
    nb = -(-n // batch_size)

    @jax.jit
    def run(p, arrs):
        def body(carry, i):
            idx = jnp.minimum(i * batch_size + jnp.arange(batch_size), n - 1)
            batch = tuple(
                _gather_rows(chunks, offs, idx).reshape(
                    (batch_size,) + tail)
                if len(tail) > 1 else _gather_rows(chunks, offs, idx)
                for chunks, offs, tail in zip(arrs, chunk_offsets, tails))
            return carry, encode_fn(p, *batch)
        _, zs = jax.lax.scan(body, None, jnp.arange(nb))
        return zs.reshape((nb * batch_size,) + zs.shape[2:])[:n]

    z = run(params, flats)
    return np.asarray(z) if to_host else z
