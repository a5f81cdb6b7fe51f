"""Native IO tests: compile the C++ library, verify batched gathers match
the numpy fallback and the written records."""

import numpy as np
import pytest

from diskrag_tpu.index.persist import write_compat_records
from diskrag_tpu.native import RecordReader, build_native, native_available


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    n, dim, r = 500, 24, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    adj = rng.integers(-1, n, size=(n, r)).astype(np.int32)
    path = tmp_path_factory.mktemp("native") / "index.dat"
    write_compat_records(path, vecs, adj)
    return path, n, dim, r, vecs, adj


def test_numpy_fallback_reader(record_file):
    path, n, dim, r, vecs, adj = record_file
    rd = RecordReader(path, n, dim, r, prefer_native=False)
    assert not rd.is_native
    ids = np.asarray([0, 7, 499, -1, 600])
    v, nb = rd.get_nodes(ids)
    np.testing.assert_array_equal(v[0], vecs[0])
    np.testing.assert_array_equal(v[2], vecs[499])
    np.testing.assert_array_equal(nb[1], adj[7])
    assert (v[3] == 0).all() and (nb[3] == -1).all()
    assert (v[4] == 0).all() and (nb[4] == -1).all()


def test_native_reader_matches_numpy(record_file):
    if not build_native():
        pytest.skip("g++ not available")
    assert native_available()
    path, n, dim, r, vecs, adj = record_file
    nat = RecordReader(path, n, dim, r, cache_capacity=4096)
    ref = RecordReader(path, n, dim, r, prefer_native=False)
    assert nat.is_native

    rng = np.random.default_rng(1)
    ids = rng.integers(-2, n + 2, size=5000)
    # batch >= capacity/4 streams past the LRU (the rerank-gather path)
    v1, n1 = nat.get_nodes(ids, n_threads=4)
    v2, n2 = ref.get_nodes(ids)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(n1, n2)
    assert nat.cache_stats()["hits"] + nat.cache_stats()["misses"] == 0

    # small batches relative to capacity go through the LRU
    v3 = nat.get_vectors(ids[:100])
    np.testing.assert_array_equal(v3, v2[:100])
    v4 = nat.get_vectors(ids[:100])  # second pass hits
    np.testing.assert_array_equal(v4, v3)
    stats = nat.cache_stats()
    assert stats["native"] and stats["misses"] > 0 and stats["hits"] > 0
    nat.close()


def test_cache_stats_after_close(tmp_path):
    """Regression: cache_stats() after close() must not pass a NULL
    handle into the C library (segfault) — it reports zeros instead."""
    import numpy as np

    from diskrag_tpu.index.persist import write_compat_records
    from diskrag_tpu.native import RecordReader

    n, d, r = 32, 8, 4
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    nbrs = rng.integers(0, n, size=(n, r)).astype(np.int32)
    path = tmp_path / "rec.dat"
    write_compat_records(path, vecs, nbrs)
    rd = RecordReader(path, n, d, r)
    rd.get_vectors(np.arange(4))
    assert rd.cache_stats()["misses"] >= 0
    rd.close()
    stats = rd.cache_stats()  # must not segfault
    assert stats == {"hits": 0, "misses": 0, "native": False}
    rd.close()  # idempotent
