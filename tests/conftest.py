"""Test harness configuration.

Runs every test on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count) — JAX's "multi-node without a
cluster" mechanism, standing in for the reference's `mpirun -np N` on one
machine (SURVEY.md section 4).  float64 is enabled so CPU oracle
comparisons against NumPy run at the reference's double precision; the
library itself is dtype-agnostic and runs f32/bf16 on TPU.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


@pytest.fixture(scope="session")
def mesh8():
    from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import make_mesh

    return make_mesh()


@pytest.fixture(scope="session")
def input_matrices():
    """The reference's five .mtx test inputs (copied to data/input)."""
    from rsvd_kamaneh_raganato_terrana_tpu.core.io import read_matrix_market

    d = os.path.join(DATA_DIR, "input")
    return {
        name: read_matrix_market(os.path.join(d, name))
        for name in sorted(os.listdir(d))
        if name.endswith(".mtx")
    }


@pytest.fixture
def rng():
    return np.random.default_rng(0)
