"""IntQuantizer (pq/intq.py) — oracles and traversal recall gates."""

import numpy as np
import jax.numpy as jnp
import pytest

from diskrag_tpu.pq import IntQuantizer, default_iq_cells
from diskrag_tpu.pq.intq import iq_score_gathered, iq_score_shared
from diskrag_tpu.graph import beam_search_iq
from diskrag_tpu.graph.knn_build import build_vamana_knn


def _data(n=4096, dim=32, nq=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(16, dim)).astype(np.float32) * 4.0
    pts = (
        centers[rng.integers(0, 16, size=n)]
        + rng.normal(size=(n, dim)).astype(np.float32)
    )
    q = pts[rng.integers(0, n, size=nq)] + 0.3 * rng.normal(
        size=(nq, dim)
    ).astype(np.float32)
    return pts, q


@pytest.mark.parametrize(
    "bits,n_cells", [(8, 0), (4, 64), (8, 64), (4, 0)]
)
def test_score_matches_decoded_distance(bits, n_cells):
    """The serving score must equal the exact squared distance to the
    decoded point, up to the 16-bit bias quantization step."""
    pts, q = _data()
    iq = IntQuantizer(bits=bits, n_cells=n_cells).fit(pts, seed=0)
    rows = iq.encode(pts)
    assert rows.dtype == np.int8 and rows.shape == (len(pts), iq.row_width)
    xhat = np.asarray(iq.decode(rows))
    oracle = (
        (q**2).sum(1)[:, None]
        - 2.0 * q @ xhat.T
        + (xhat**2).sum(1)[None, :]
    )
    tables = iq.query_tables(q)
    got = np.asarray(iq.asymmetric_distance_sq(tables, rows))
    # bias lanes quantize ||xhat||^2 to 16 bits
    tol = iq.bias_scale * 1.01 + 1e-2 * np.abs(oracle).max() * 1e-4
    np.testing.assert_allclose(got, oracle, atol=max(tol, 1e-2), rtol=1e-4)


def test_gathered_matches_shared():
    pts, q = _data()
    iq = IntQuantizer(bits=4, n_cells=64).fit(pts, seed=0)
    rows = jnp.asarray(iq.encode(pts))
    tables = iq.query_tables(q)
    ids = np.random.default_rng(1).integers(0, len(pts), size=(len(q), 37))
    shared = np.asarray(
        iq_score_shared(
            tables, rows, dim=iq.dim, bits=iq.bits, n_cells=iq.n_cells
        )
    )
    want = np.take_along_axis(shared, ids, axis=1)
    for onehot in (True, False):
        got = np.asarray(
            iq_score_gathered(
                tables, rows[jnp.asarray(ids)],
                dim=iq.dim, bits=iq.bits, n_cells=iq.n_cells,
                onehot_cells=onehot,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_pack_unpack_int4_exact():
    """Nibble packing must round-trip every value in [-8, 7]."""
    pts, _ = _data(n=512, dim=16)
    iq = IntQuantizer(bits=4, n_cells=0).fit(pts, seed=0)
    rows = iq.encode(pts)
    z = np.clip(
        np.round(np.asarray(pts) / np.asarray(iq.scales)), -8, 7
    )
    from diskrag_tpu.pq.intq import _unpack_rows

    got, _, _ = _unpack_rows(jnp.asarray(rows), iq.dim, 4, 0)
    np.testing.assert_array_equal(np.asarray(got), z)


def test_reconstruction_improves_with_bits_and_cells():
    pts, _ = _data()
    e4 = IntQuantizer(bits=4, n_cells=0).fit(pts).reconstruction_error(pts)
    e4c = IntQuantizer(bits=4, n_cells=64).fit(pts).reconstruction_error(pts)
    e8 = IntQuantizer(bits=8, n_cells=0).fit(pts).reconstruction_error(pts)
    assert e8 < e4c < e4
    raw_var = float(np.sum(np.var(pts, axis=0)))
    assert e8 < 0.01 * raw_var


def test_persistence_round_trip(tmp_path):
    pts, q = _data()
    iq = IntQuantizer(bits=4, n_cells=64).fit(pts, seed=0)
    np.savez(tmp_path / "iq.npz", **iq.to_arrays())
    back = IntQuantizer.from_arrays(dict(np.load(tmp_path / "iq.npz")))
    assert back.bits == 4 and back.n_cells == iq.n_cells
    assert back.bias_scale == pytest.approx(iq.bias_scale)
    rows = iq.encode(pts[:100])
    np.testing.assert_array_equal(rows, back.encode(pts[:100]))
    t0 = iq.query_tables(q)
    t1 = back.query_tables(q)
    np.testing.assert_allclose(
        np.asarray(iq.asymmetric_distance_sq(t0, rows)),
        np.asarray(back.asymmetric_distance_sq(t1, rows)),
        rtol=1e-6,
    )


def test_default_iq_cells():
    assert default_iq_cells(200_000, 8) == 0
    assert default_iq_cells(200_000, 4) == 1024
    assert default_iq_cells(2_000, 4) == 31 or default_iq_cells(2_000, 4) >= 16


@pytest.mark.parametrize("bits,n_cells", [(8, 0), (4, 64)])
def test_traversal_recall(bits, n_cells):
    """Graph traversal guided by int rows + exact rerank must stay close
    to exact-traversal quality (gate mirrors the PQ traversal test)."""
    pts, q = _data(n=8192, dim=32, nq=32, seed=3)
    index = build_vamana_knn(pts, degree_bound=24, alpha=1.2, seed=0)
    # brute-force ground truth
    d = (
        (q**2).sum(1)[:, None]
        - 2.0 * q @ pts.T
        + (pts**2).sum(1)[None, :]
    )
    gt = np.argsort(d, axis=1)[:, :10]
    iq = IntQuantizer(bits=bits, n_cells=n_cells).fit(pts, seed=0)
    rows = jnp.asarray(iq.encode(pts))
    res = beam_search_iq(
        rows, iq.query_tables(q), index.adjacency, index.medoid,
        dim=iq.dim, bits=iq.bits, n_cells=iq.n_cells,
        search_width=32, k=10, rerank=True,
        vectors=index.vectors, queries=jnp.asarray(q),
        expand_width=4, entry_points=index.entry_points,
    )
    got = np.asarray(res.ids)
    recall = np.mean(
        [len(set(got[i]) & set(gt[i])) / 10 for i in range(len(q))]
    )
    assert recall >= 0.9, f"iq{bits}/cells={n_cells} recall {recall}"


@pytest.mark.parametrize("bits,n_cells", [(8, 0), (4, 64)])
def test_gather_pad_scores_identical(bits, n_cells):
    """256 B gather padding (pad_rows_for_gather) must be a pure layout
    change: scores over padded rows are bit-identical to unpadded
    (the unpacker slices lanes by absolute position)."""
    from diskrag_tpu.pq.intq import pad_rows_for_gather

    pts, q = _data(n=1024, dim=32, nq=8, seed=5)
    iq = IntQuantizer(bits=bits, n_cells=n_cells).fit(pts, seed=0)
    rows = np.asarray(iq.encode(pts))
    padded = pad_rows_for_gather(rows)
    assert padded.shape[1] == 256 and rows.shape[1] < 256
    t = iq.query_tables(q)
    s0 = np.asarray(iq_score_shared(
        t, jnp.asarray(rows), dim=iq.dim, bits=iq.bits, n_cells=iq.n_cells
    ))
    s1 = np.asarray(iq_score_shared(
        t, jnp.asarray(padded), dim=iq.dim, bits=iq.bits, n_cells=iq.n_cells
    ))
    np.testing.assert_array_equal(s0, s1)
