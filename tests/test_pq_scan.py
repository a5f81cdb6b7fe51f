"""Pallas ADC kernel numeric test (interpret mode on the CPU suite; the
compiled path runs on real TPU via the benchmark)."""

import numpy as np
import jax.numpy as jnp

from diskrag_tpu.ops.pq_scan import adc_lookup_gathered_pallas
from diskrag_tpu.pq.product_quantizer import adc_lookup_gathered


def test_pallas_adc_matches_gather(rng):
    b, m, c = 5, 8, 37  # odd sizes exercise padding
    tables = jnp.asarray(rng.normal(size=(b, m, 256)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 256, size=(b, c, m)), jnp.int32)
    want = np.asarray(adc_lookup_gathered(tables, codes))
    got = np.asarray(adc_lookup_gathered_pallas(tables, codes, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
