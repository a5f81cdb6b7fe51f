"""Product Quantizer — TPU-native replacement for the reference's
DiskANNPQ (the live class at pydiskann/pq/fast_pq.py:162-350: no input
normalization, n_centroids forced to 256 / uint8 codes, per-subvector
k-means, ADC distance tables).

Design differences (behavior-preserving, architecture re-done):
  - all m sub-quantizers train simultaneously (batched k-means) instead of
    an m-iteration sklearn loop (reference fast_pq.py:225-241);
  - encode / decode / ADC are chunked batched device programs;
  - the codebook is one [m, 256, sub_dim] tensor, not m sklearn objects;
  - optional OPQ: a learned orthogonal rotation applied before subspace
    split (alternating codebook fit / Procrustes update). No reference
    counterpart — reduces quantization error when variance is unevenly
    spread across subspaces (e.g. strongly clustered data).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.pq.kmeans import _batched_sq_dists, kmeans_fit

N_CENTROIDS = 256  # uint8 codes — same invariant as the reference
                   # (fast_pq.py:177-181 forces 256)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _encode_impl(codebooks: jax.Array, vectors: jax.Array, chunk: int = 8192):
    """vectors [N, D] -> uint8 codes [N, m] (argmin centroid per subspace)."""
    m, k, ds = codebooks.shape
    n = vectors.shape[0]
    pad = (-n) % chunk
    v = jnp.pad(vectors, ((0, pad), (0, 0)))
    tiles = v.reshape(-1, chunk, m, ds)  # [C, chunk, m, ds]

    def tile_fn(td):
        sub = td.transpose(1, 0, 2)  # [m, chunk, ds]
        d = _batched_sq_dists(sub, codebooks)  # [m, chunk, K]
        return jnp.argmin(d, axis=-1).astype(jnp.uint8).T  # [chunk, m]

    codes = jax.lax.map(tile_fn, tiles).reshape(-1, m)
    return codes[:n]


@jax.jit
def _decode_impl(codebooks: jax.Array, codes: jax.Array) -> jax.Array:
    """codes uint8 [N, m] -> reconstructed vectors [N, m*ds]."""
    m = codebooks.shape[0]
    sub = codebooks[jnp.arange(m)[None, :], codes.astype(jnp.int32)]  # [N, m, ds]
    return sub.reshape(codes.shape[0], -1)


@jax.jit
def _distance_table_impl(codebooks: jax.Array, queries: jax.Array) -> jax.Array:
    """ADC lookup tables: queries [B, D] -> [B, m, K] squared distances.

    Batched generalization of the reference's per-query
    `compute_distance_table` (fast_pq.py:294-318).
    """
    b = queries.shape[0]
    m, k, ds = codebooks.shape
    q = queries.reshape(b, m, ds).transpose(1, 0, 2)  # [m, B, ds]
    d = _batched_sq_dists(q, codebooks)  # [m, B, K]
    return d.transpose(1, 0, 2)  # [B, m, K]


@jax.jit
def adc_lookup(tables: jax.Array, codes: jax.Array) -> jax.Array:
    """Asymmetric distance: tables [B, m, K], codes [N, m] -> [B, N].

    Equivalent of the reference's `asymmetric_distance_sq`
    (fast_pq.py:320-328), batched over queries.
    """
    c = codes.astype(jnp.int32).T  # [m, N]
    g = jnp.take_along_axis(tables, c[None, :, :], axis=2)  # [B, m, N]
    return jnp.sum(g, axis=1)


@jax.jit
def adc_lookup_gathered(tables: jax.Array, codes: jax.Array) -> jax.Array:
    """ADC for per-query candidate sets: tables [B, m, K],
    codes [B, C, m] -> [B, C]. Used on gathered neighbor codes inside the
    PQ-accelerated graph search."""
    b, m, k = tables.shape
    c = codes.astype(jnp.int32)
    g = jnp.take_along_axis(
        tables[:, None, :, :],  # [B, 1, m, K]
        c[:, :, :, None],  # [B, C, m, 1]
        axis=3,
    )[..., 0]  # [B, C, m]
    return jnp.sum(g, axis=-1)


@dataclasses.dataclass
class ProductQuantizer:
    """PQ model. API shape mirrors the reference's DiskANNPQ
    (fit / encode / decode / compute_distance_table / asymmetric_distance_sq,
    fast_pq.py:197-333) with batched-query variants."""

    n_subvectors: int
    n_centroids: int = N_CENTROIDS
    codebooks: jax.Array | None = None  # [m, 256, sub_dim]
    rotation: jax.Array | None = None   # [D, D] orthogonal (OPQ), optional
    is_fitted: bool = False

    def __post_init__(self):
        if self.n_centroids != N_CENTROIDS:
            raise ValueError(
                f"n_centroids is fixed at {N_CENTROIDS} (uint8 codes), got "
                f"{self.n_centroids}"
            )

    @property
    def sub_dim(self) -> int:
        if self.codebooks is not None:
            return self.codebooks.shape[-1]
        raise RuntimeError("not fitted")

    def fit(
        self,
        vectors: np.ndarray | jax.Array,
        *,
        seed: int = 0,
        max_iter: int | None = None,
        max_train_points: int = 262_144,
        opq_iters: int = 0,
    ) -> "ProductQuantizer":
        """Train codebooks. Subsamples to `max_train_points` for training
        (the reference fits sklearn on everything; sampling is the standard
        large-scale practice and quality-neutral for 256 centroids).

        opq_iters > 0 enables OPQ: alternate (fit codebooks on rotated
        data) and (update the rotation by orthogonal Procrustes against
        the reconstruction): R <- U V^T from SVD(X^T X_hat). Queries and
        vectors are rotated transparently by encode/decode/
        compute_distance_tables; ADC tables and codes keep their shapes.
        """
        vectors = jnp.asarray(vectors, jnp.float32)
        n, dim = vectors.shape
        m = self.n_subvectors
        if dim % m != 0:
            raise ValueError(f"dimension {dim} not divisible by m={m}")
        if n < self.n_centroids:
            raise ValueError(
                f"need >= {self.n_centroids} points to fit PQ, got {n}"
            )
        if max_iter is None:
            # adaptive effort by scale, like the reference's n_init/max_iter
            # schedule (fast_pq.py:188-195)
            max_iter = 25 if n <= 100_000 else 15
        key = jax.random.key(seed)
        if n > max_train_points:
            idx = jax.random.choice(
                jax.random.fold_in(key, 1), n, shape=(max_train_points,),
                replace=False,
            )
            train = vectors[idx]
        else:
            train = vectors
        def fit_codebooks(x, it_key):
            sub = x.reshape(x.shape[0], m, dim // m).transpose(1, 0, 2)
            centers, _ = kmeans_fit(
                it_key, sub, self.n_centroids, max_iter=max_iter
            )
            return centers

        if opq_iters <= 0:
            # same key schedule as iteration 0 of the OPQ loop so
            # opq_iters=0 and the never-rotated opq_iters=1 coincide
            self.codebooks = fit_codebooks(train, jax.random.fold_in(key, 0))
            self.rotation = None
            self.is_fitted = True
            return self

        rot = jnp.eye(dim, dtype=jnp.float32)
        rot_updated = False
        for it in range(opq_iters):
            x = train if not rot_updated else train @ rot
            self.codebooks = fit_codebooks(x, jax.random.fold_in(key, it))
            self.is_fitted = True
            if it == opq_iters - 1:
                break
            x_hat = _decode_impl(
                self.codebooks, _encode_impl(self.codebooks, x)
            )
            u, _, vt = jnp.linalg.svd(train.T @ x_hat, full_matrices=False)
            rot = u @ vt
            rot_updated = True
        # opq_iters=1 never rotates: storing the identity would add a
        # useless [D, D] matmul to every encode/query and D^2 floats to
        # the artifact for a model identical to opq_iters=0
        self.rotation = rot if rot_updated else None
        return self

    def _rotate(self, vectors: jax.Array) -> jax.Array:
        if self.rotation is None:
            return vectors
        return vectors @ self.rotation

    def encode(self, vectors: np.ndarray | jax.Array) -> jax.Array:
        self._check_fitted()
        return _encode_impl(
            self.codebooks, self._rotate(jnp.asarray(vectors, jnp.float32))
        )

    def decode(self, codes: np.ndarray | jax.Array) -> jax.Array:
        """Reconstruct in the ORIGINAL space (rotation undone)."""
        self._check_fitted()
        rec = _decode_impl(self.codebooks, jnp.asarray(codes))
        if self.rotation is None:
            return rec
        return rec @ self.rotation.T

    def compute_distance_tables(self, queries: np.ndarray | jax.Array) -> jax.Array:
        """[B, D] -> [B, m, 256] ADC tables. Rotation-invariant distances:
        the query is rotated into codebook space first."""
        self._check_fitted()
        return _distance_table_impl(
            self.codebooks, self._rotate(jnp.asarray(queries, jnp.float32))
        )

    def asymmetric_distance_sq(
        self, tables: jax.Array, codes: jax.Array
    ) -> jax.Array:
        """tables [B, m, 256], codes [N, m] -> [B, N] squared distances."""
        return adc_lookup(tables, codes)

    def symmetric_distance_tables(self) -> jax.Array:
        """Per-subspace centroid-pair squared distances [m, 256, 256] —
        the precomputed form of the reference's symmetric PQ distance
        (reference cython_utils.pyx:26-51 computes it scalar per pair)."""
        self._check_fitted()
        cb = self.codebooks  # [m, K, ds]
        n2 = jnp.sum(jnp.square(cb), axis=-1)  # [m, K]
        cross = jnp.einsum(
            "mkd,mld->mkl", cb, cb, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.maximum(n2[:, :, None] + n2[:, None, :] - 2.0 * cross, 0.0)

    def symmetric_distance_sq(
        self,
        codes_a: jax.Array,
        codes_b: jax.Array,
        tables: jax.Array | None = None,
    ) -> jax.Array:
        """Approximate squared distance between coded points:
        codes_a [A, m], codes_b [B, m] -> [A, B]."""
        if tables is None:
            tables = self.symmetric_distance_tables()
        a = jnp.asarray(codes_a).astype(jnp.int32)  # [A, m]
        b = jnp.asarray(codes_b).astype(jnp.int32)  # [B, m]
        m = tables.shape[0]
        sub = tables[
            jnp.arange(m)[None, None, :],  # [1, 1, m]
            a[:, None, :],                 # [A, 1, m]
            b[None, :, :],                 # [1, B, m]
        ]  # [A, B, m]
        return jnp.sum(sub, axis=-1)

    def reconstruction_error(self, vectors: np.ndarray | jax.Array) -> float:
        """Mean squared reconstruction error (the reference's PQ-validation
        metric, scripts/tools/build_index.py:215-236)."""
        v = jnp.asarray(vectors, jnp.float32)
        rec = self.decode(self.encode(v))
        return float(jnp.mean(jnp.sum(jnp.square(v - rec), axis=1)))

    def estimate_selectivity(self, n_points: int) -> dict:
        """Compression stats (reference fast_pq.py:335-350)."""
        self._check_fitted()
        dim = self.n_subvectors * self.sub_dim
        raw = n_points * dim * 4
        compressed = n_points * self.n_subvectors
        return {
            "n_points": n_points,
            "raw_bytes": raw,
            "compressed_bytes": compressed,
            "compression_ratio": raw / max(compressed, 1),
        }

    # --- persistence ----------------------------------------------------
    def to_arrays(self) -> dict[str, np.ndarray]:
        self._check_fitted()
        out = {
            "codebooks": np.asarray(self.codebooks, np.float32),
            "n_subvectors": np.asarray(self.n_subvectors),
            "n_centroids": np.asarray(self.n_centroids),
        }
        if self.rotation is not None:
            out["rotation"] = np.asarray(self.rotation, np.float32)
        return out

    @classmethod
    def from_arrays(cls, arrays: dict) -> "ProductQuantizer":
        cb = jnp.asarray(arrays["codebooks"], jnp.float32)
        pq = cls(n_subvectors=int(arrays["n_subvectors"]))
        if cb.shape[0] != pq.n_subvectors or cb.shape[1] != N_CENTROIDS:
            raise ValueError(f"bad codebook shape {cb.shape}")
        pq.codebooks = cb
        if "rotation" in arrays:
            pq.rotation = jnp.asarray(arrays["rotation"], jnp.float32)
        pq.is_fitted = True
        return pq

    def _check_fitted(self):
        if not self.is_fitted or self.codebooks is None:
            raise RuntimeError("ProductQuantizer is not fitted")
