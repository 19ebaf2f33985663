"""Multi-host glue: single-process degenerate behavior of the pod-mesh
helpers (multi-host behavior exercised only on real pods; the API contract
is identical at every scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.core.distributed import (
    initialize,
    make_pod_mesh,
    row_spec_for,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    generate_omega,
    rsvd_with_omega,
)


def test_initialize_is_noop_single_host():
    initialize()  # must not raise or hang
    assert jax.process_count() == 1


def test_pod_mesh_single_host():
    mesh = make_pod_mesh()
    assert mesh.devices.size == len(jax.devices())
    spec = row_spec_for(mesh)
    a = jax.device_put(
        jnp.zeros((64, 16)), jax.sharding.NamedSharding(mesh, spec)
    )
    assert a.sharding.is_fully_replicated is False


def test_rsvd_on_pod_mesh(rng):
    mesh = make_pod_mesh()
    a_np = rng.standard_normal((256, 64))
    a = jax.device_put(
        jnp.asarray(a_np),
        jax.sharding.NamedSharding(mesh, row_spec_for(mesh)),
    )

    def run(x):
        omega = generate_omega(0, 64, 16, x.dtype)
        return rsvd_with_omega(x, omega, q=1, k=8)

    u, s, v = jax.jit(run)(a)
    u1, s1, v1 = jax.jit(run)(jnp.asarray(a_np))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s1), rtol=1e-9)
