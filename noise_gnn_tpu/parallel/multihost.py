"""Multi-host entry: single-controller JAX over a TPU pod slice.

The reference has no distributed story (SURVEY §2.4); scaling was SLURM
array jobs. Here a pod-slice run is:

    # on every host of the slice (or let the TPU runtime autodetect):
    python -c "from noise_gnn_tpu.parallel.multihost import initialize; \
               initialize()" && python main.py -config ...

After ``initialize()``, ``jax.devices()`` spans the slice; ``make_mesh``
builds the global (data x model) mesh and every pjit'd step's collectives
ride ICI within a slice and DCN across slices — XLA emits them from the
sharding annotations, no transport code here.

For CI without hardware, ``simulate_multihost_env`` documents the
``xla_force_host_platform_device_count`` recipe used by tests/conftest.py.
"""

from __future__ import annotations

import os

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with TPU autodetection when args are None.

    Safe to call on a single host (no-op when only one process)."""
    if num_processes in (None, 1) and coordinator_address is None and (
        "TPU_WORKER_HOSTNAMES" not in os.environ
        or len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) <= 1
    ):
        return  # single-host: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def simulate_multihost_env(n_devices: int = 8) -> dict:
    """Env vars that fake an n-device CPU platform (set BEFORE jax's
    backends initialize — tests/conftest.py applies this)."""
    return {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_devices}",
    }
