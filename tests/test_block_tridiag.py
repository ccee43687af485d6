"""Block-tridiagonal solver vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.ops import block_tridiag as bt

KEY = jax.random.PRNGKey(5)


def random_spd_tridiag(key, batch, F):
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (batch, F, 3, 3))
    diag = jnp.einsum("bfij,bfkj->bfik", A, A) + 5.0 * jnp.eye(3)
    upper = jax.random.normal(k2, (batch, F, 3, 3)) * 0.3
    upper = upper.at[:, -1].set(0.0)
    # build dense to symmetrise / verify
    dense = jnp.zeros((batch, 3 * F, 3 * F))
    for f in range(F):
        dense = dense.at[:, 3 * f : 3 * f + 3, 3 * f : 3 * f + 3].set(diag[:, f])
    for f in range(F - 1):
        dense = dense.at[:, 3 * f : 3 * f + 3, 3 * f + 3 : 3 * f + 6].set(upper[:, f])
        dense = dense.at[:, 3 * f + 3 : 3 * f + 6, 3 * f : 3 * f + 3].set(
            jnp.swapaxes(upper[:, f], -1, -2)
        )
    return diag, upper, dense


def test_inv3():
    A = jax.random.normal(KEY, (16, 3, 3)) + 3.0 * jnp.eye(3)
    np.testing.assert_allclose(
        bt.inv3(A) @ A, jnp.broadcast_to(jnp.eye(3), (16, 3, 3)), atol=1e-4
    )


def test_solve_matches_dense():
    diag, upper, dense = random_spd_tridiag(KEY, 4, 6)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 3, 7))
    x = bt.solve(diag, upper, rhs)
    x_dense = jnp.linalg.solve(dense, rhs.reshape(4, 18, 7))
    np.testing.assert_allclose(x.reshape(4, 18, 7), x_dense, atol=1e-3)


def test_full_inverse():
    diag, upper, dense = random_spd_tridiag(KEY, 3, 5)
    Pinv = bt.full_inverse(diag, upper).reshape(3, 15, 15)
    np.testing.assert_allclose(Pinv @ dense, jnp.broadcast_to(jnp.eye(15), (3, 15, 15)), atol=1e-3)


def test_jit_and_grad_safe():
    diag, upper, _ = random_spd_tridiag(KEY, 2, 4)
    f = jax.jit(bt.full_inverse)
    out = f(diag, upper)
    assert np.isfinite(np.asarray(out)).all()
