"""Gather fast-adjoint parity (forward + VJP vs plain take)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_lite_tpu.ops.gather import build_gather_aux, gather_rows


def test_gather_rows_parity(rng, monkeypatch):
    n, e, f = 300, 20000, 128
    idx = rng.randint(0, n, e).astype(np.int32)
    aux = build_gather_aux(idx, n)
    x = jnp.asarray(rng.randn(n, f).astype(np.float32))
    w = jnp.asarray(rng.randn(e, f).astype(np.float32))

    # Default path = plain take.
    np.testing.assert_array_equal(
        np.asarray(gather_rows(x, aux)),
        np.asarray(jnp.take(x, jnp.asarray(idx), axis=0)),
    )

    # Forced kernel path: forward + gradient parity (interpret on CPU).
    monkeypatch.setenv("GCLT_FAST_GATHER_ADJ", "1")
    monkeypatch.setenv("GCLT_PALLAS_SEGMENT", "1")
    out = gather_rows(x, aux)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take(x, jnp.asarray(idx), axis=0))
    )
    g1 = jax.grad(lambda x: (gather_rows(x, aux) * w).sum())(x)
    g2 = jax.grad(
        lambda x: (jnp.take(x, jnp.asarray(idx), axis=0) * w).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)
