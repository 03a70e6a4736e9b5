"""Clustering suite + full sweep drivers (reference scripts 13 and 16).

Structural improvement over the reference: each representation's (N, N)
euclidean distance matrix is computed ONCE on device and shared by
  - every DBSCAN cell (epsilon-graph thresholding),
  - every silhouette evaluation,
  - the ward linkage
instead of being recomputed inside sklearn for each of the 102 cells
(reference scripts/16:159-244).  KMeans cells run the vmapped-restart device
kernel.  Row schema and scoring match the reference CSVs exactly:
  13: sil + ari - 0.2*dbi ranking (13:226-231);
  16: conservative score sil + ari - 0.2*dbi - 0.8*noise_frac (16:109-117).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from vae_hmc_tpu.cluster.kmeans import kmeans_dispatch
from vae_hmc_tpu.core.config import KMeansConfig
from vae_hmc_tpu.metrics import internal
from vae_hmc_tpu.metrics.safe import safe_ari


@dataclass
class RepData:
    """A representation prepared for sweeping: features + cached distances.

    Everything expensive is computed once and shared across every sweep cell
    (and across scripts 13 and 16 when the pipeline threads the same RepData
    through both):
      - `dists_dev`: the (N, N) device distance matrix — silhouettes and the
        DBSCAN epsilon-graphs read it in place;
      - `dists`: its host copy — only the ward NN-chain needs host
        distances (DBSCAN and silhouettes are fully on device), and the one
        ~34 MB readback per representation is prefetched on a background
        thread at build time so it overlaps the device sweep cells;
      - `ward_merges()`: the (N-1, 4) ward linkage, computed once and cut at
        every k (the reference re-runs the full O(N^2) linkage per k,
        scripts/16:201)."""

    name: str
    y_true: Optional[np.ndarray]        # (N,) genre strings or None
    x_dev: object = None                # (N, d) device float32 (reused by
                                        # every kmeans/DBI cell, no re-upload)
    dists_dev: object = None            # device-resident distances (reused by
                                        # every silhouette cell)
    _x_host: Optional[np.ndarray] = None
    _dists_host: Optional[np.ndarray] = None
    _merges: Optional[np.ndarray] = None
    _dists_thread: object = None
    _kmeans_cache: Optional[Dict] = None
    _kmeans_pending: Optional[Dict] = None   # key -> device result tuple
    _ward_thread: object = None
    _merges_bg: Optional[np.ndarray] = None

    @classmethod
    def build(cls, name: str, x,
              y_true: Optional[np.ndarray]) -> "RepData":
        """x: host numpy OR device array; device inputs never round-trip."""
        import jax
        import jax.numpy as jnp
        x_host = None if isinstance(x, jax.Array) else np.asarray(
            x, dtype=np.float32).reshape(len(x), -1)
        x_dev = jnp.asarray(x, dtype=jnp.float32)
        if x_dev.ndim > 2:
            x_dev = x_dev.reshape(x_dev.shape[0], -1)
        d_dev = internal.centered_euclidean_dists(x_dev)  # ONE program
        rep = cls(name=name, y_true=y_true, x_dev=x_dev, dists_dev=d_dev,
                  _x_host=x_host)
        rep._start_dists_prefetch()
        return rep

    def _start_dists_prefetch(self) -> None:
        """Fetch the host distance copy (ward's input) on a background
        thread so the ~34 MB readback overlaps the device sweep cells."""
        import threading

        def fetch():
            self._dists_host = np.asarray(self.dists_dev)

        self._dists_thread = threading.Thread(target=fetch, daemon=True)
        self._dists_thread.start()

    @property
    def n(self) -> int:
        return int(self.x_dev.shape[0])

    @property
    def x(self) -> np.ndarray:
        """(N, d) features on host (lazy fetch; sweep paths don't need it)."""
        if self._x_host is None:
            self._x_host = np.asarray(self.x_dev)
        return self._x_host

    @property
    def dists(self) -> np.ndarray:
        """(N, N) euclidean distances on host (one prefetched device fetch)."""
        if self._dists_thread is not None:
            self._dists_thread.join()
            self._dists_thread = None
        if self._dists_host is None:
            self._dists_host = np.asarray(self.dists_dev)
        return self._dists_host

    def ward_prefetch(self) -> None:
        """Compute the ward linkage on a background thread.

        The C++ NN-chain releases the GIL, so the linkage (host CPU work)
        genuinely overlaps the device kmeans/DBSCAN cells the sweep is
        dispatching meanwhile.  The worker first joins the dists-prefetch
        thread (its input); ward_merges() joins this thread."""
        if (self._merges is not None or self._ward_thread is not None
                or self.dists_dev is None):
            return
        import threading

        def work():
            from vae_hmc_tpu.cluster.agglomerative import (
                ward_linkage_from_sq_dists)
            self._merges_bg = ward_linkage_from_sq_dists(
                self.dists.astype(np.float64) ** 2)

        self._ward_thread = threading.Thread(target=work, daemon=True)
        self._ward_thread.start()

    def ward_merges(self) -> np.ndarray:
        """Ward linkage (scipy format), computed once per representation."""
        if self._ward_thread is not None:
            self._ward_thread.join()
            self._ward_thread = None
            self._merges = self._merges_bg
        if self._merges is None:
            from vae_hmc_tpu.cluster.agglomerative import (
                ward_linkage_from_sq_dists)
            self._merges = ward_linkage_from_sq_dists(
                self.dists.astype(np.float64) ** 2)
        return self._merges

    def kmeans_prefetch(self, ks: Sequence[int], n_init: int = 10,
                        seed: int = 42) -> None:
        """Dispatch the kmeans restart program for every k NOW, no fetch.

        Scripts 13+16 evaluate 15 kmeans cells (3 reps x ks); fetching each
        inside its evaluate_cell serializes a device round-trip per cell.
        Pre-dispatching queues all programs back-to-back on the device
        stream, so by the time a cell's labels are fetched the result is
        already sitting in HBM.  Bit-identical: kmeans_labels consumes the
        exact tuple kmeans() would have produced (same program, same key)."""
        if self._kmeans_cache is None:
            self._kmeans_cache = {}
        if self._kmeans_pending is None:
            self._kmeans_pending = {}
        for k in ks:
            key = (int(k), int(n_init), int(seed))
            if key in self._kmeans_cache or key in self._kmeans_pending:
                continue
            self._kmeans_pending[key] = kmeans_dispatch(
                self.x_dev, KMeansConfig(n_clusters=int(k), n_init=n_init,
                                         seed=seed))

    def kmeans_labels(self, k: int, n_init: int = 10,
                      seed: int = 42) -> np.ndarray:
        """KMeans labels on x_dev, memoized per (k, n_init, seed).

        Scripts 13, 16 and 15 all cluster the same representation at the
        same (k=6, n_init=10, seed=42) cell — the reference re-fits sklearn
        KMeans in each script (13:120, 16:173, 15:49-52).  One fit here is
        trivially bit-identical everywhere it is reused (same kmeans() call
        on the same device array), and each dedup saves an n_init-restart
        device program dispatch (~0.5-1 s under tunnel congestion)."""
        key = (int(k), int(n_init), int(seed))
        if self._kmeans_cache is None:
            self._kmeans_cache = {}
        if self._kmeans_pending and key in self._kmeans_pending:
            labels = self._kmeans_pending.pop(key)[0]
            self._kmeans_cache[key] = np.asarray(labels, dtype=np.int32)
        if key not in self._kmeans_cache:
            labels = kmeans_dispatch(self.x_dev, KMeansConfig(
                n_clusters=k, n_init=n_init, seed=seed))[0]
            self._kmeans_cache[key] = np.asarray(labels, dtype=np.int32)
        return self._kmeans_cache[key]


def _safe_sil_d(rep: RepData, yhat: np.ndarray) -> Optional[float]:
    keep = yhat != -1
    lk = yhat[keep]
    if len(np.unique(lk)) < 2 or len(lk) < 3:
        return None
    try:
        # masked device silhouette: noise points carry zero weight, the
        # cached device distance matrix is reused across every cell.
        # lazy: the 0-d device scalar is fetched in finalize_rows with all
        # the other cells' scores — one transfer for the whole sweep
        # instead of one blocking round-trip per cell
        return internal.silhouette_from_dists_masked(rep.dists_dev, yhat,
                                                     lazy=True)
    except Exception:
        return None


def _safe_dbi(rep: RepData, yhat: np.ndarray) -> Optional[float]:
    keep = yhat != -1
    lk = yhat[keep]
    if len(np.unique(lk)) < 2:
        return None
    try:
        # masked device DBI: noise points carry zero weight and the cached
        # device feature matrix is reused — no per-cell host->device upload
        # of the (N, 82k) mel-flat representation (was ~1 GB per cell)
        return internal.davies_bouldin_masked(rep.x_dev, yhat, lazy=True)
    except Exception:
        return None


_STACK_FNS: Dict[int, object] = {}


def _stack_jit(*xs):
    """jit-cached stack of n 0-d scalars (one tiny program per arity)."""
    import jax
    import jax.numpy as jnp
    f = _STACK_FNS.get(len(xs))
    if f is None:
        f = _STACK_FNS[len(xs)] = jax.jit(lambda *a: jnp.stack(a))
    return f(*xs)


def finalize_rows(rows: List[Dict]) -> List[Dict]:
    """Resolve deferred device metric scalars with ONE host transfer and
    fill the conservative scores that depend on them."""
    import jax
    import jax.numpy as jnp
    pend = [(i, key) for i, r in enumerate(rows)
            for key in ("silhouette", "davies_bouldin")
            if isinstance(r.get(key), jax.Array)]
    if pend:
        try:
            # jitted stack: an eager dispatch costs ~0.5-1 s on tunneled
            # devices (CLAUDE.md); one small program per pending-count
            vals = np.asarray(_stack_jit(*[rows[i][key] for i, key in pend]))
        except Exception:
            # a failed cell's device program surfaces here instead of at the
            # (pre-lazy) per-cell float(); degrade that cell to None like
            # the per-cell guards always did, keeping the rest of the sweep
            vals = []
            for i, key in pend:
                try:
                    vals.append(float(rows[i][key]))
                except Exception:
                    vals.append(None)
        for (i, key), v in zip(pend, vals):
            rows[i][key] = None if v is None else float(v)
    for r in rows:
        if "noise_frac" in r and r.get("score") is None:
            r["score"] = conservative_score(r["silhouette"],
                                            r["davies_bouldin"], r["ari"],
                                            r["noise_frac"])
    return rows


def evaluate_cell(rep: RepData, algo: str, params: str,
                  yhat: np.ndarray, with_noise_frac: bool) -> Dict:
    from vae_hmc_tpu.metrics.safe import n_effective_clusters, noise_fraction
    uniq = np.unique(yhat)
    noise_frac = noise_fraction(yhat)
    n_noise = int(np.sum(yhat == -1))
    n_found = n_effective_clusters(yhat)
    sil = _safe_sil_d(rep, yhat)
    dbi = _safe_dbi(rep, yhat)
    ari = safe_ari(rep.y_true, yhat) if rep.y_true is not None else None
    row = {
        "representation": rep.name,
        "algo": algo,
        "params": params,
        "n_clusters_found": (len(uniq) if algo in ("kmeans", "agglomerative")
                             else n_found),
        "n_noise": n_noise,
        "silhouette": sil,
        "davies_bouldin": dbi,
        "ari": ari,
    }
    if with_noise_frac:
        import jax
        row["noise_frac"] = noise_frac
        # sil/dbi may be deferred device scalars; the score is then filled
        # by finalize_rows after the one bulk fetch
        row["score"] = (None if any(isinstance(v, jax.Array)
                                    for v in (sil, dbi))
                        else conservative_score(sil, dbi, ari,
                                                row["noise_frac"]))
    return row


def conservative_score(sil, dbi, ari, noise_frac) -> float:
    """Reference scripts/16:109-117."""
    sil_v = sil if sil is not None else -1.0
    dbi_v = dbi if dbi is not None else 10.0
    ari_v = ari if ari is not None else 0.0
    return float(sil_v) + float(ari_v) - 0.2 * float(dbi_v) - 0.8 * float(noise_frac)


def heuristic_score(row: Dict) -> float:
    """Reference scripts/13:226-231 ranking."""
    sil = row["silhouette"] if row["silhouette"] is not None else -1.0
    dbi = row["davies_bouldin"] if row["davies_bouldin"] is not None else 10.0
    ari = row["ari"] if row["ari"] is not None else 0.0
    return float(sil) + float(ari) - 0.2 * float(dbi)


def _dbscan_grid_from_dists(rep: RepData, eps_values: Sequence[float],
                            min_samples_values: Sequence[int]) -> Dict:
    # ALL grid cells labeled in one vmapped device program from the cached
    # device distance matrix; one (C, N) fetch (was: a dispatch + fetch
    # round-trip per cell)
    from vae_hmc_tpu.cluster.dbscan import dbscan_sweep_from_dists_device
    return dbscan_sweep_from_dists_device(rep.dists_dev, eps_values,
                                          min_samples_values)


def cluster_suite(rep: RepData, n_clusters: int,
                  dbscan_eps: Sequence[float] = (0.4, 0.6, 0.8, 1.0, 1.2),
                  dbscan_min_samples: int = 5,
                  kmeans_n_init: int = 10, seed: int = 42) -> List[Dict]:
    """Reference scripts/13:116-151 run_cluster_suite."""
    import time as _time
    from vae_hmc_tpu.core.profiling import log as _vlog
    _t = [_time.perf_counter()]

    def _mark(name):
        now = _time.perf_counter()
        _vlog(f"suite13/{rep.name}/{name}: {now - _t[0]:.1f}s")
        _t[0] = now

    rep.kmeans_prefetch([n_clusters], kmeans_n_init, seed)
    rep.ward_prefetch()
    rows = []
    rows.append(evaluate_cell(rep, "kmeans", f"k={n_clusters}",
                              rep.kmeans_labels(n_clusters, kmeans_n_init,
                                                seed),
                              with_noise_frac=False))
    _mark("kmeans")
    from vae_hmc_tpu.cluster.agglomerative import cut_tree_n_clusters
    ag = cut_tree_n_clusters(rep.ward_merges(), rep.n, n_clusters)
    rows.append(evaluate_cell(rep, "agglomerative", f"k={n_clusters},ward",
                              ag, with_noise_frac=False))
    _mark("ward")
    grid = _dbscan_grid_from_dists(rep, dbscan_eps, [dbscan_min_samples])
    for eps in dbscan_eps:
        yhat = grid[(float(eps), int(dbscan_min_samples))]
        rows.append(evaluate_cell(
            rep, "dbscan", f"eps={eps},min={dbscan_min_samples}", yhat,
            with_noise_frac=False))
    _mark("dbscan")
    out = finalize_rows(rows)
    _mark("finalize")
    return out


def full_sweep(rep: RepData,
               ks: Sequence[int] = (4, 5, 6, 7, 8),
               eps_values: Sequence[float] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
                                              0.9, 1.0),
               min_samples_values: Sequence[int] = (3, 5, 8),
               kmeans_n_init: int = 10, seed: int = 42) -> List[Dict]:
    """Reference scripts/16:159-244: per representation,
    (k x {kmeans, agglomerative}) + (eps x min_samples) DBSCAN grid."""
    import time as _time
    from vae_hmc_tpu.core.profiling import log as _vlog
    _t = [_time.perf_counter()]

    def _mark(name):
        now = _time.perf_counter()
        _vlog(f"sweep16/{rep.name}/{name}: {now - _t[0]:.1f}s")
        _t[0] = now

    from vae_hmc_tpu.cluster.agglomerative import cut_tree_n_clusters
    rep.kmeans_prefetch(ks, kmeans_n_init, seed)
    rep.ward_prefetch()
    rows = []
    for k in ks:
        rows.append(evaluate_cell(rep, "kmeans", f"k={k}",
                                  rep.kmeans_labels(k, kmeans_n_init, seed),
                                  with_noise_frac=True))
        ag = cut_tree_n_clusters(rep.ward_merges(), rep.n, k)
        rows.append(evaluate_cell(rep, "agglomerative", f"k={k},ward", ag,
                                  with_noise_frac=True))
    _mark("kmeans+ward")
    grid = _dbscan_grid_from_dists(rep, eps_values, min_samples_values)
    for eps in eps_values:
        for ms in min_samples_values:
            yhat = grid[(float(eps), int(ms))]
            rows.append(evaluate_cell(rep, "dbscan", f"eps={eps},min={ms}",
                                      yhat, with_noise_frac=True))
    _mark("dbscan")
    out = finalize_rows(rows)
    _mark("finalize")
    return out
