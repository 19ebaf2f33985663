#!/bin/bash
# CPU test runner.
#
# IMPORTANT: PYTHONPATH is overridden to drop /root/.axon_site so the axon
# TPU sitecustomize hook does not register a TPU session for CPU-only test
# runs (the relay is single-session; concurrent registrations deadlock).
# Because the hook is stripped, xdist workers are plain CPU processes and
# may run concurrently (-n 4); do NOT add -n to pytest.ini — the driver's
# default-env pytest would spawn axon-hooked workers and deadlock.
cd "$(dirname "$0")"
exec env PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -n "${PYTEST_WORKERS:-4}" "$@"
