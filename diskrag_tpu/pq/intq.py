"""Int quantizer — MXU-scorable compressed rows (int8 / int4 + coarse cell).

Why this exists: PQ's asymmetric-distance computation is a table LOOKUP
per (query, candidate, subspace). CPUs do that in L1 cache; the reference
serves exactly that way (search_engine.py:398-506 over DiskANNPQ codes,
pydiskann/pq/fast_pq.py:294-328). A TPU has no hardware gather in the
compute units — a 256-way lookup lowers to 256 vector compare-selects, and
the measured Pallas ADC round-lookup (19 ms at B=1000, C=384, m=32)
dominates PQ-mode serving at ~6x slower than exact search. The TPU-native
compressed format is therefore one the MXU can score DIRECTLY: per-dim
scalar-quantized rows whose approximate distance is a plain matmul

    ||q - xhat||^2 = ||q||^2                     (per query)
                   - 2 q . c_cell                 (cell term, [B, C] table)
                   - 2 (q * s) . z                (the MXU dot, int rows)
                   + ||xhat||^2                   (bias, folded into the row)

with xhat = c_cell + s * z. Everything a candidate needs lives in ONE
int8 row gathered from HBM: the quantized coords z, the cell id, and the
bias quantized to 16 bits across two lanes — zero extra per-candidate
gathers (scalar XLA gathers cost ~3 ms/round at serving shapes; folding
them into the row is the difference between 10k and 40k QPS).

Formats (D = vector dim):
  int8:  row = [ z int8 x D | bias_hi | bias_lo ]              (D+2 bytes)
  int4:  row = [ z nibble-packed x D/2 | cid_hi | cid_lo |
                 bias_hi | bias_lo ]                           (D/2+4 bytes)
int8 needs no coarse cell (quantization error is negligible at raw data
range); int4's 16 levels only resolve a zero-mean residual, so it pairs
with a coarse k-means cell whose id rides in the row. Measured brute
ordering recall@10 on the 200k benchmark set: int8 0.94 (130 B/pt),
int4+1024 cells 0.77 (68 B/pt) — vs residual-PQ m=32's 0.64 (~38 B/pt)
and plain-PQ m=32's 0.23. VQ still wins quality-per-byte; these rows win
~10x on traversal speed. Both tiers ship: ResidualPQ = max compression
(host/beyond-HBM), IntQuantizer = fast quantized traversal.

This component has no reference counterpart — it is the framework's
TPU-first replacement for the reference's PQ-accelerated serving mode
(reference search_engine.py:381-506); exact-rerank of the surviving beam
plays the role of the reference's hybrid exact/PQ policy
(search_engine.py:381-397). L2 only: for cosine, normalize the corpus and
use L2 (docs/PERFORMANCE.md "Angular configuration").
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.pq.kmeans import kmeans_fit
from diskrag_tpu.pq.residual import _coarse_assign_impl

_BIAS_LANES = 2
_CID_LANES = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IQTables:
    """Per-query-batch scoring state for an IntQuantizer.

    qw:     [B, D] f32 — query pre-scaled by the per-dim step (q * s).
    qn:     [B] f32 — ||q||^2.
    cell_t: [B, C] f32 — -2 q . c_j per coarse cell (None when cell-less).
    bias_lo / bias_scale: [] f32 — bias 16-bit dequant affine.
    """

    qw: jax.Array
    qn: jax.Array
    cell_t: jax.Array | None
    bias_lo: jax.Array
    bias_scale: jax.Array


def _unpack_rows(rows: jax.Array, dim: int, bits: int, n_cells: int):
    """rows int8 [..., W] -> (z f32 [..., D], cid int32 [...] | None,
    bias f32 [...] in quantized 16-bit units)."""
    zl = dim // 2 if bits == 4 else dim
    zb = rows[..., :zl]
    if bits == 4:
        u = zb.astype(jnp.uint8)
        lo_u = (u & 0xF).astype(jnp.int32)
        hi_u = (u >> 4).astype(jnp.int32)
        lo = lo_u - 16 * (lo_u >= 8)  # two's-complement nibble sign
        hi = hi_u - 16 * (hi_u >= 8)
        z = jnp.stack([lo, hi], axis=-1).reshape(*rows.shape[:-1], dim)
    else:
        z = zb
    pos = zl
    cid = None
    if n_cells > 0:
        cid_hi = rows[..., pos].astype(jnp.int32)
        cid_lo = rows[..., pos + 1].astype(jnp.int32) + 128
        cid = cid_hi * 256 + cid_lo
        pos += _CID_LANES
    b_hi = rows[..., pos].astype(jnp.int32) + 128
    b_lo = rows[..., pos + 1].astype(jnp.int32) + 128
    bias_q = (b_hi * 256 + b_lo).astype(jnp.float32)
    return z.astype(jnp.float32), cid, bias_q


def pad_rows_for_gather(rows: np.ndarray, min_bytes: int = 256) -> np.ndarray:
    """Pad int8 code rows with trailing zero lanes up to >=`min_bytes`.

    HBM row gathers on this TPU run ~3x faster once the row is >=256 B
    (probed 2026-08-20 on i32 tables, CLAUDE.md "pad row width to
    >=256 B for hot gather tables"): narrower rows waste the gather
    engine's minimum transfer. Scoring ignores trailing lanes
    (_unpack_rows slices by absolute position), so the pad is
    correctness-free and costs only HBM capacity (130 -> 256 B/pt at
    D=128 bits=8; a 10M-point host tier pays 2.56 GB of 16 GB). The
    traversal loop is round-LATENCY-bound, so faster gathers shorten
    every sequential frontier round."""
    w = int(rows.shape[-1])
    if w >= min_bytes:
        return np.asarray(rows)
    return np.pad(np.asarray(rows), [(0, 0)] * (rows.ndim - 1)
                  + [(0, min_bytes - w)])


def _cell_term(cell_t: jax.Array, cid: jax.Array, onehot: bool) -> jax.Array:
    """cell_t [B, C], cid int32 [B, Cand] -> [B, Cand].

    `onehot` computes the lookup as a fused compare-select-reduce (VPU
    work XLA fuses without materializing [B, Cand, C]) instead of a
    per-element gather — per-element gathers at serving shapes cost
    ~3 ms/round on this platform (CLAUDE.md)."""
    if not onehot:
        return jnp.take_along_axis(cell_t, cid, axis=1)
    c = cell_t.shape[1]
    iota = jnp.arange(c, dtype=jnp.int32)
    eq = cid[..., None] == iota  # [B, Cand, C] — fused, never materialized
    return jnp.sum(jnp.where(eq, cell_t[:, None, :], 0.0), axis=-1)


@functools.partial(
    jax.jit, static_argnames=("dim", "bits", "n_cells", "onehot_cells")
)
def iq_score_gathered(
    tables: IQTables,
    rows: jax.Array,
    *,
    dim: int,
    bits: int,
    n_cells: int,
    onehot_cells: bool = True,
) -> jax.Array:
    """Score per-query gathered rows: rows int8 [B, Cand, W] -> [B, Cand]
    approximate squared L2 distances (== exact distance to the decoded
    point, up to the 16-bit bias quantization)."""
    z, cid, bias_q = _unpack_rows(rows, dim, bits, n_cells)
    cross = jnp.einsum(
        "bd,bcd->bc", tables.qw, z, preferred_element_type=jnp.float32
    )
    out = tables.qn[:, None] - 2.0 * cross
    out = out + bias_q * tables.bias_scale + tables.bias_lo
    if n_cells > 0:
        out = out + _cell_term(tables.cell_t, cid, onehot_cells)
    return out


@functools.partial(jax.jit, static_argnames=("dim", "bits", "n_cells"))
def iq_score_shared(
    tables: IQTables,
    rows: jax.Array,
    *,
    dim: int,
    bits: int,
    n_cells: int,
) -> jax.Array:
    """Score a SHARED candidate set: rows int8 [S, W] -> [B, S]. One row
    decode for the whole batch (search-seed path)."""
    z, cid, bias_q = _unpack_rows(rows, dim, bits, n_cells)
    cross = jnp.einsum(
        "bd,sd->bs", tables.qw, z, preferred_element_type=jnp.float32
    )
    out = tables.qn[:, None] - 2.0 * cross
    out = out + (bias_q * tables.bias_scale + tables.bias_lo)[None, :]
    if n_cells > 0:
        out = out + tables.cell_t[:, cid]
    return out


@jax.jit
def _query_tables_impl(q, scales, cell_centroids, bias_lo, bias_scale):
    cell_t = None
    if cell_centroids is not None:
        cell_t = -2.0 * jnp.einsum(
            "bd,cd->bc", q, cell_centroids,
            preferred_element_type=jnp.float32,
        )
    return IQTables(
        qw=q * scales,
        qn=jnp.sum(jnp.square(q), axis=-1),
        cell_t=cell_t,
        bias_lo=jnp.asarray(bias_lo, jnp.float32),
        bias_scale=jnp.asarray(bias_scale, jnp.float32),
    )


@dataclasses.dataclass
class IntQuantizer:
    """Per-dim scalar quantizer with optional coarse cells, encoded into
    self-contained int8 rows the traversal can score with one gather +
    one matmul. `bits` in {4, 8}; `n_cells` 0 disables the coarse stage
    (recommended for bits=8)."""

    bits: int = 8
    n_cells: int = 0
    cell_centroids: jax.Array | None = None  # [C, D] f32
    scales: jax.Array | None = None          # [D] f32 per-dim step
    bias_lo: float = 0.0
    bias_scale: float = 1.0
    is_fitted: bool = False

    def __post_init__(self):
        if self.bits not in (4, 8):
            raise ValueError(f"bits must be 4 or 8, got {self.bits}")
        if self.n_cells > 32768:
            raise ValueError("n_cells > 32768 does not fit the cid lanes")

    # --- geometry -----------------------------------------------------------
    @property
    def dim(self) -> int:
        self._check_fitted()
        return int(self.scales.shape[0])

    @property
    def row_width(self) -> int:
        """int8 lanes per encoded row."""
        d = self.dim
        zl = d // 2 if self.bits == 4 else d
        return zl + (_CID_LANES if self.n_cells > 0 else 0) + _BIAS_LANES

    @property
    def _lim(self) -> int:
        return 2 ** (self.bits - 1) - 1  # 7 or 127

    def fit(
        self,
        vectors: np.ndarray | jax.Array,
        *,
        seed: int = 0,
        cell_iters: int = 10,
        max_train_points: int = 262_144,
    ) -> "IntQuantizer":
        """Train coarse cells (d2-init k-means, when n_cells > 0) and the
        per-dim quantization steps on a subsample. The bias dequant affine
        is also frozen here (new points encoded later clip into it —
        ordering error only for outliers, and the exact rerank absorbs
        it)."""
        v = jnp.asarray(vectors, jnp.float32)
        n, d = v.shape
        if self.bits == 4 and d % 2 != 0:
            raise ValueError("bits=4 requires an even dimension")
        key = jax.random.key(seed)
        if n > max_train_points:
            idx = jax.random.choice(
                jax.random.fold_in(key, 1), n, shape=(max_train_points,),
                replace=False,
            )
            train = v[idx]
        else:
            train = v
        if self.n_cells > 0:
            c = min(self.n_cells, max(1, int(train.shape[0]) // 4))
            centers, assign = kmeans_fit(
                jax.random.fold_in(key, 2), train[None], c,
                max_iter=cell_iters, init="d2",
            )
            self.cell_centroids = centers[0]
            self.n_cells = c
            res = train - self.cell_centroids[assign[0]]
        else:
            res = train
        # per-dim step: symmetric max-abs grid (robust enough at 4/8 bits;
        # values beyond the training range clip)
        self.scales = jnp.maximum(
            jnp.max(jnp.abs(res), axis=0) / self._lim, 1e-8
        )
        # bias range with headroom for unseen points
        zt = jnp.clip(
            jnp.round(res / self.scales), -self._lim - 1, self._lim
        )
        xhat = zt * self.scales
        if self.n_cells > 0:
            xhat = xhat + self.cell_centroids[assign[0]]
        bn = jnp.sum(jnp.square(xhat), axis=-1)
        lo = float(jnp.min(bn))
        hi = float(jnp.max(bn))
        span = max(hi - lo, 1e-6)
        self.bias_lo = max(0.0, lo - 0.15 * span)
        self.bias_scale = (hi + 0.35 * span - self.bias_lo) / 65535.0
        self.is_fitted = True
        return self

    # --- encoding -----------------------------------------------------------
    def encode(
        self, vectors: np.ndarray | jax.Array, chunk: int = 2_000_000
    ) -> np.ndarray:
        """vectors [N, D] -> int8 rows [N, row_width].

        Chunked above `chunk` rows: the un-chunked body materializes
        v/z/xhat f32+i32 device intermediates (~1.5 GB per 1M x 128
        rows), which exhausted the 16 GB chip at 10M (2026-08-21 host
        tier run). Chunks share compiled shapes except the tail."""
        self._check_fitted()
        n = int(vectors.shape[0])
        if n > chunk:
            return np.concatenate(
                [
                    self.encode(vectors[i : i + chunk])
                    for i in range(0, n, chunk)
                ],
                axis=0,
            )
        v = jnp.asarray(vectors, jnp.float32)
        if self.n_cells > 0:
            cid = _coarse_assign_impl(self.cell_centroids, v)
            res = v - self.cell_centroids[cid]
        else:
            cid = None
            res = v
        z = jnp.clip(
            jnp.round(res / self.scales), -self._lim - 1, self._lim
        ).astype(jnp.int32)
        xhat = z.astype(jnp.float32) * self.scales
        if cid is not None:
            xhat = xhat + self.cell_centroids[cid]
        bias = jnp.sum(jnp.square(xhat), axis=-1)
        bq = jnp.clip(
            jnp.round((bias - self.bias_lo) / self.bias_scale), 0, 65535
        ).astype(jnp.int32)

        z = np.asarray(z, np.int32)
        n = z.shape[0]
        parts = []
        if self.bits == 4:
            zu = (z & 0xF).astype(np.uint8)
            packed = (zu[:, 1::2] << 4) | zu[:, 0::2]
            parts.append(packed.view(np.int8))
        else:
            parts.append(z.astype(np.int8))
        if cid is not None:
            cid = np.asarray(cid, np.int32)
            parts.append((cid >> 8).astype(np.int8)[:, None])
            parts.append(((cid & 0xFF) - 128).astype(np.int8)[:, None])
        bq = np.asarray(bq, np.int32)
        parts.append(((bq >> 8) - 128).astype(np.int8)[:, None])
        parts.append(((bq & 0xFF) - 128).astype(np.int8)[:, None])
        return np.concatenate(parts, axis=1)

    def decode(self, rows: np.ndarray | jax.Array) -> jax.Array:
        """rows [N, W] -> dequantized xhat [N, D] f32 (exact, not via the
        16-bit bias)."""
        self._check_fitted()
        rows = jnp.asarray(rows, jnp.int8)
        z, cid, _ = _unpack_rows(rows, self.dim, self.bits, self.n_cells)
        xhat = z * self.scales
        if cid is not None:
            xhat = xhat + self.cell_centroids[cid]
        return xhat

    # --- scoring ------------------------------------------------------------
    def query_tables(self, queries: np.ndarray | jax.Array) -> IQTables:
        """One jitted dispatch (serving hot path: engine calls this per
        request before the traversal program — eager ops cost ~1.5 ms
        each on this platform, see CLAUDE.md)."""
        self._check_fitted()
        return _query_tables_impl(
            jnp.asarray(queries, jnp.float32), self.scales,
            self.cell_centroids, float(self.bias_lo), float(self.bias_scale),
        )

    # alias: engine code treats quantizers uniformly
    compute_distance_tables = query_tables

    def asymmetric_distance_sq(
        self, tables: IQTables, rows: np.ndarray | jax.Array
    ) -> jax.Array:
        """tables, rows [N, W] -> [B, N] approximate squared distances
        (dense oracle / diagnostics path)."""
        self._check_fitted()
        return iq_score_shared(
            tables, jnp.asarray(rows, jnp.int8),
            dim=self.dim, bits=self.bits, n_cells=self.n_cells,
        )

    def reconstruction_error(self, vectors: np.ndarray | jax.Array) -> float:
        v = jnp.asarray(vectors, jnp.float32)
        rec = self.decode(self.encode(v))
        return float(jnp.mean(jnp.sum(jnp.square(v - rec), axis=1)))

    def estimate_selectivity(self, n_points: int) -> dict:
        """Compression stats (reference fast_pq.py:335-350 protocol)."""
        self._check_fitted()
        raw = n_points * self.dim * 4
        compressed = n_points * self.row_width
        return {
            "n_points": n_points,
            "raw_bytes": raw,
            "compressed_bytes": compressed,
            "compression_ratio": raw / max(compressed, 1),
        }

    # --- persistence ----------------------------------------------------------
    def to_arrays(self) -> dict[str, np.ndarray]:
        self._check_fitted()
        out = {
            "iq_scales": np.asarray(self.scales, np.float32),
            "iq_meta": np.asarray(
                [float(self.bits), float(self.n_cells),
                 self.bias_lo, self.bias_scale], np.float64,
            ),
        }
        if self.n_cells > 0:
            out["iq_cell_centroids"] = np.asarray(
                self.cell_centroids, np.float32
            )
        return out

    @classmethod
    def from_arrays(cls, arrays: dict) -> "IntQuantizer":
        meta = np.asarray(arrays["iq_meta"], np.float64)
        q = cls(bits=int(meta[0]), n_cells=int(meta[1]))
        q.bias_lo = float(meta[2])
        q.bias_scale = float(meta[3])
        q.scales = jnp.asarray(arrays["iq_scales"], jnp.float32)
        if q.n_cells > 0:
            q.cell_centroids = jnp.asarray(
                arrays["iq_cell_centroids"], jnp.float32
            )
        q.is_fitted = True
        return q

    def _check_fitted(self):
        if not self.is_fitted or self.scales is None:
            raise RuntimeError("IntQuantizer is not fitted")


def default_iq_cells(n_points: int, bits: int) -> int:
    """int4 rows need the coarse stage (16 levels only resolve a zero-mean
    residual); int8 resolves the raw range on its own."""
    if bits == 8:
        return 0
    return int(min(1024, max(16, n_points // 64)))
