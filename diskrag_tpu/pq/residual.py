"""Residual Product Quantizer — coarse k-means + PQ on residuals.

Why: plain PQ spends its 256 centroids per subspace modeling the GLOBAL
point distribution; on clustered data (every real embedding matrix, and
this repo's benchmark set) most of that budget goes to cluster structure
and the leftover intra-cluster precision is too coarse to order true
near-neighbors (measured: plain m=32 brute-ADC recall@10 = 0.23 on the
200-cluster synthetic set — docs/PERFORMANCE.md "Notes on the PQ-guided
mode"). Quantizing the residual r = x - c_assign(x) instead makes the PQ
codebooks model a homogeneous zero-mean cloud: measured brute-ADC
recall@10 rises to 0.63 (m=32) / 0.88 (m=64) at the same code size
(+2-4 bytes/point for the coarse id).

The reference has no residual quantizer (its DiskANNPQ is plain PQ,
pydiskann/pq/fast_pq.py:162-350); this is the framework's fix for the
reference's PQ-accelerated serving mode (search_engine.py:381-506) whose
quality collapses on clustered data. The construction is the classic
IVFADC decomposition (Jégou et al.) computed TPU-style: everything
batched, three-term ADC with the query-independent cross term
precomputed once.

ADC decomposition per subspace s (codeword e, coarse centroid c_j):
    ||q - c_j - e||² = ||q - c_j||²                 (term0, [B, C] per query)
                     + Σ_s (||e_s||² - 2 q_s·e_s)   (T1,   [B, m, 256] per query)
                     + Σ_s (2 c_{j,s}·e_s)          (T2,   [C, m, 256] precomputed)
so a point's approximate distance needs one term0 gather + m T1 lookups
(the existing Pallas ADC kernel, ops/pq_scan.py) + m T2 gathers.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.pq.kmeans import kmeans_fit
from diskrag_tpu.pq.product_quantizer import (
    N_CENTROIDS,
    ProductQuantizer,
    adc_lookup,
)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _coarse_assign_impl(
    centers: jax.Array, vectors: jax.Array, chunk: int = 8192
) -> jax.Array:
    """vectors [N, D] -> nearest-coarse-centroid ids int32 [N]."""
    n = vectors.shape[0]
    pad = (-n) % chunk
    v = jnp.pad(vectors, ((0, pad), (0, 0)))
    tiles = v.reshape(-1, chunk, v.shape[1])
    cn = jnp.sum(jnp.square(centers), axis=-1)  # [C]

    def tile_fn(t):
        cross = jnp.einsum(
            "nd,cd->nc", t, centers, preferred_element_type=jnp.float32
        )
        return jnp.argmin(cn[None, :] - 2.0 * cross, axis=-1)

    out = jax.lax.map(tile_fn, tiles).reshape(-1)
    return out[:n].astype(jnp.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RPQTables:
    """Per-query-batch ADC state for a ResidualPQ."""

    t1: jax.Array     # [B, m, 256] — residual part (query-dependent)
    term0: jax.Array  # [B, C] — query-to-coarse-centroid squared distances


@jax.jit
def rpq_lookup_gathered(
    tables: RPQTables,
    t2_flat: jax.Array,
    codes: jax.Array,
    coarse_ids: jax.Array,
) -> jax.Array:
    """ADC for per-query candidate sets: codes [B, Cand, m] uint8,
    coarse_ids [B, Cand] int32 -> [B, Cand] squared distances.
    `t2_flat` is the flattened [C*m*256] cross-term table."""
    from diskrag_tpu.pq.product_quantizer import adc_lookup_gathered

    m = tables.t1.shape[1]
    d1 = adc_lookup_gathered(tables.t1, codes)  # [B, Cand]
    d0 = jnp.take_along_axis(tables.term0, coarse_ids, axis=1)  # [B, Cand]
    idx = (
        coarse_ids[..., None] * (m * N_CENTROIDS)
        + jnp.arange(m, dtype=jnp.int32)[None, None, :] * N_CENTROIDS
        + codes.astype(jnp.int32)
    )  # [B, Cand, m]
    d2 = jnp.sum(t2_flat[idx], axis=-1)
    return d0 + d1 + d2


@jax.jit
def rpq_lookup(
    tables: RPQTables,
    t2_flat: jax.Array,
    codes: jax.Array,
    coarse_ids: jax.Array,
) -> jax.Array:
    """ADC against a SHARED candidate set: codes [S, m], coarse_ids [S]
    -> [B, S]. The T2/coarse parts are computed once for the set and
    broadcast over the batch (used for shared search seeds)."""
    m = tables.t1.shape[1]
    d1 = adc_lookup(tables.t1, codes)  # [B, S]
    d0 = tables.term0[:, coarse_ids]  # [B, S]
    idx = (
        coarse_ids[:, None] * (m * N_CENTROIDS)
        + jnp.arange(m, dtype=jnp.int32)[None, :] * N_CENTROIDS
        + codes.astype(jnp.int32)
    )  # [S, m]
    d2 = jnp.sum(t2_flat[idx], axis=-1)  # [S]
    return d0 + d1 + d2[None, :]


@dataclasses.dataclass
class ResidualPQ:
    """Coarse quantizer + PQ over residuals.

    API mirrors ProductQuantizer where the concepts coincide; encode
    returns (codes, coarse_ids) and the query tables are an RPQTables
    pair instead of a single array. HBM cost per point: m bytes codes +
    4 bytes coarse id; plus one [C, m, 256] f32 cross-term table that is
    independent of N."""

    n_subvectors: int
    n_coarse: int = 1024
    n_centroids: int = N_CENTROIDS
    coarse_centroids: jax.Array | None = None  # [C, D] f32
    pq: ProductQuantizer | None = None
    is_fitted: bool = False
    _t2_flat: jax.Array | None = dataclasses.field(default=None, repr=False)

    def __post_init__(self):
        if self.n_centroids != N_CENTROIDS:
            raise ValueError(
                f"n_centroids is fixed at {N_CENTROIDS} (uint8 codes)"
            )

    @property
    def sub_dim(self) -> int:
        self._check_fitted()
        return self.pq.sub_dim

    @property
    def dim(self) -> int:
        self._check_fitted()
        return int(self.coarse_centroids.shape[1])

    def fit(
        self,
        vectors: np.ndarray | jax.Array,
        *,
        seed: int = 0,
        max_iter: int | None = None,
        coarse_iters: int = 12,
        max_train_points: int = 262_144,
    ) -> "ResidualPQ":
        """Train the coarse codebook (d2-init k-means — one-shot joint D²
        seeding is the right init at large k, pq/kmeans.py) then the
        residual PQ, both on a shared training subsample."""
        vectors = jnp.asarray(vectors, jnp.float32)
        n, dim = vectors.shape
        m = self.n_subvectors
        if dim % m != 0:
            raise ValueError(f"dimension {dim} not divisible by m={m}")
        c = min(self.n_coarse, max(1, n // 4))
        if n < self.n_centroids:
            raise ValueError(
                f"need >= {self.n_centroids} points to fit PQ, got {n}"
            )
        key = jax.random.key(seed)
        if n > max_train_points:
            idx = jax.random.choice(
                jax.random.fold_in(key, 1), n, shape=(max_train_points,),
                replace=False,
            )
            train = vectors[idx]
        else:
            train = vectors
        centers, assign = kmeans_fit(
            jax.random.fold_in(key, 2), train[None], c,
            max_iter=coarse_iters, init="d2",
        )
        self.coarse_centroids = centers[0]
        self.n_coarse = c
        residuals = train - self.coarse_centroids[assign[0]]
        self.pq = ProductQuantizer(n_subvectors=m).fit(
            residuals, seed=seed, max_iter=max_iter,
            max_train_points=max_train_points,
        )
        self.is_fitted = True
        self._t2_flat = None
        return self

    # --- encoding ---------------------------------------------------------
    def coarse_assign(self, vectors: np.ndarray | jax.Array) -> jax.Array:
        self._check_fitted()
        return _coarse_assign_impl(
            self.coarse_centroids, jnp.asarray(vectors, jnp.float32)
        )

    def encode(
        self, vectors: np.ndarray | jax.Array, chunk: int = 2_000_000
    ) -> tuple[jax.Array, jax.Array]:
        """vectors [N, D] -> (codes uint8 [N, m], coarse_ids int32 [N]).

        Chunked above `chunk` rows: v + residuals are [N, D] f32 device
        intermediates (~1 GB per 1M x 128 each), which at 10M would
        exhaust the 16 GB chip (same failure mode as IntQuantizer.encode,
        2026-08-21). The concatenated outputs are small (m+4 bytes/row)."""
        self._check_fitted()
        n = int(vectors.shape[0])
        if n > chunk:
            parts = [
                self.encode(vectors[i : i + chunk])
                for i in range(0, n, chunk)
            ]
            return (
                jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0),
            )
        v = jnp.asarray(vectors, jnp.float32)
        cid = _coarse_assign_impl(self.coarse_centroids, v)
        residuals = v - self.coarse_centroids[cid]
        return self.pq.encode(residuals), cid

    def decode(
        self, codes: np.ndarray | jax.Array, coarse_ids: np.ndarray | jax.Array
    ) -> jax.Array:
        self._check_fitted()
        cid = jnp.asarray(coarse_ids, jnp.int32)
        return self.coarse_centroids[cid] + self.pq.decode(codes)

    # --- ADC ---------------------------------------------------------------
    @property
    def t2_flat(self) -> jax.Array:
        """Flattened cross-term table [C*m*256] f32: T2[j,s,k] = 2 c_{j,s}·e_{s,k}.
        Query-independent — computed once per process and cached."""
        self._check_fitted()
        if self._t2_flat is None:
            m = self.n_subvectors
            ds = self.pq.sub_dim
            csub = self.coarse_centroids.reshape(self.n_coarse, m, ds)
            t2 = 2.0 * jnp.einsum(
                "cmd,mkd->cmk", csub, self.pq.codebooks,
                preferred_element_type=jnp.float32,
            )
            self._t2_flat = t2.reshape(-1)
        return self._t2_flat

    def compute_query_tables(
        self, queries: np.ndarray | jax.Array
    ) -> RPQTables:
        """queries [B, D] -> (T1 [B, m, 256], term0 [B, C])."""
        self._check_fitted()
        q = jnp.asarray(queries, jnp.float32)
        return _query_tables_impl(
            self.coarse_centroids, self.pq.codebooks, q
        )

    # alias so engine code can treat plain/residual PQ uniformly where the
    # table object is passed straight back into the matching lookup
    compute_distance_tables = compute_query_tables

    def asymmetric_distance_sq(
        self,
        tables: RPQTables,
        codes: jax.Array,
        coarse_ids: jax.Array,
    ) -> jax.Array:
        """tables, codes [N, m], coarse_ids [N] -> [B, N] squared dists."""
        return rpq_lookup(
            tables, self.t2_flat, jnp.asarray(codes),
            jnp.asarray(coarse_ids, jnp.int32),
        )

    # --- serving decomposition ---------------------------------------------
    # The graph-traversal serving path reuses the PLAIN-PQ machinery
    # (inner-PQ [B, m, 256] tables + the existing Pallas gathered-ADC
    # kernel) untouched, via:
    #     ||q - c - e||^2 = sum_s ||q_s - e_s||^2          (inner tables)
    #                     - 2 q.c                          (cell_tables [B, C])
    #                     + ||c||^2 + 2 c.e                (point_bias f32 [N])
    # so a candidate costs the plain-PQ code gather + ONE int32 cell-id
    # gather + ONE f32 bias gather — no [C, m, 256] cross-term gathers on
    # the hot path (those stay in rpq_lookup* for oracles/diagnostics).

    def inner_tables(self, queries: np.ndarray | jax.Array) -> jax.Array:
        """Plain-PQ ADC tables of the RESIDUAL codebooks against the full
        query: [B, m, 256]. Feed to the unchanged ADC lookup kernels."""
        self._check_fitted()
        return self.pq.compute_distance_tables(queries)

    def cell_tables(self, queries: np.ndarray | jax.Array) -> jax.Array:
        """[B, C] query-cell cross terms: -2 q . c_j."""
        self._check_fitted()
        return _cell_tables_impl(
            self.coarse_centroids, jnp.asarray(queries, jnp.float32)
        )

    def point_bias(
        self,
        codes: np.ndarray | jax.Array,
        coarse_ids: np.ndarray | jax.Array,
        *,
        chunk: int = 262_144,
    ) -> jax.Array:
        """f32 [N] per-point constant: ||c||^2 + 2 c . e (c = assigned
        coarse centroid, e = decoded residual). Persisted next to the
        codes so serving never touches the codebooks per candidate.

        Chunked over N: the decode intermediates are [chunk, D] f32 —
        whole-N at 1M+ next to the training leftovers OOMed a 16 GB chip
        (measured 2026-08-19 in save_pq_artifacts at 1M x 128)."""
        self._check_fitted()
        n = int(codes.shape[0])
        out = []
        for lo in range(0, n, chunk):
            cid = jnp.asarray(coarse_ids[lo : lo + chunk], jnp.int32)
            c = self.coarse_centroids[cid]                   # [W, D]
            e = self.pq.decode(codes[lo : lo + chunk])       # [W, D]
            out.append(jnp.sum(c * (c + 2.0 * e), axis=-1))
        return jnp.concatenate(out) if len(out) > 1 else out[0]

    def reconstruction_error(self, vectors: np.ndarray | jax.Array) -> float:
        v = jnp.asarray(vectors, jnp.float32)
        rec = self.decode(*self.encode(v))
        return float(jnp.mean(jnp.sum(jnp.square(v - rec), axis=1)))

    def estimate_selectivity(self, n_points: int) -> dict:
        """Compression stats (reference fast_pq.py:335-350 protocol; the
        coarse id adds 4 bytes/point, the T2 table is O(C) not O(N))."""
        self._check_fitted()
        dim = self.dim
        raw = n_points * dim * 4
        compressed = n_points * (self.n_subvectors + 4)
        return {
            "n_points": n_points,
            "raw_bytes": raw,
            "compressed_bytes": compressed,
            "compression_ratio": raw / max(compressed, 1),
        }

    # --- persistence --------------------------------------------------------
    def to_arrays(self) -> dict[str, np.ndarray]:
        self._check_fitted()
        out = self.pq.to_arrays()
        out["coarse_centroids"] = np.asarray(
            self.coarse_centroids, np.float32
        )
        return out

    @classmethod
    def from_arrays(cls, arrays: dict) -> "ResidualPQ":
        pq = ProductQuantizer.from_arrays(
            {k: v for k, v in arrays.items() if k != "coarse_centroids"}
        )
        cc = jnp.asarray(arrays["coarse_centroids"], jnp.float32)
        rpq = cls(
            n_subvectors=pq.n_subvectors, n_coarse=int(cc.shape[0]),
            coarse_centroids=cc, pq=pq, is_fitted=True,
        )
        return rpq

    def _check_fitted(self):
        if not self.is_fitted or self.pq is None:
            raise RuntimeError("ResidualPQ is not fitted")


@jax.jit
def _query_tables_impl(
    coarse_centroids: jax.Array, codebooks: jax.Array, queries: jax.Array
) -> RPQTables:
    b, dim = queries.shape
    m, k, ds = codebooks.shape
    # term0: [B, C] exact query-to-coarse squared distances
    qn = jnp.sum(jnp.square(queries), axis=-1)[:, None]
    cn = jnp.sum(jnp.square(coarse_centroids), axis=-1)[None, :]
    cross = jnp.einsum(
        "bd,cd->bc", queries, coarse_centroids,
        preferred_element_type=jnp.float32,
    )
    term0 = jnp.maximum(qn + cn - 2.0 * cross, 0.0)
    # T1: ||e||² - 2 q_s·e  per subspace
    qsub = queries.reshape(b, m, ds)
    e2 = jnp.sum(jnp.square(codebooks), axis=-1)  # [m, K]
    qe = jnp.einsum(
        "bmd,mkd->bmk", qsub, codebooks, preferred_element_type=jnp.float32
    )
    t1 = e2[None, :, :] - 2.0 * qe
    return RPQTables(t1=t1, term0=term0)


@jax.jit
def _cell_tables_impl(coarse_centroids: jax.Array, q: jax.Array) -> jax.Array:
    return -2.0 * jnp.einsum(
        "bd,cd->bc", q, coarse_centroids,
        preferred_element_type=jnp.float32,
    )


def pq_from_arrays(arrays: dict):
    """Factory: build the right quantizer type from a persisted artifact
    dict (IntQuantizer when iq_meta is present, ResidualPQ when the
    coarse codebook is, plain ProductQuantizer otherwise)."""
    if "iq_meta" in arrays:
        from diskrag_tpu.pq.intq import IntQuantizer

        return IntQuantizer.from_arrays(arrays)
    if "coarse_centroids" in arrays:
        return ResidualPQ.from_arrays(arrays)
    return ProductQuantizer.from_arrays(arrays)


def default_n_coarse(n_points: int) -> int:
    """Coarse codebook sizing: recall is insensitive to C past a few
    hundred cells (measured 0.879 @ C=1024 vs 0.878 @ C=4096 — the win is
    cluster-mean removal, not cell granularity), so keep C modest: the
    [C, m, 256] cross-term table costs C·m·1KB of HBM."""
    return int(min(2048, max(64, n_points // 64)))
