"""Device mesh construction.

The reference's host topology (``hosts`` config list, mpirun hostfiles with
slots — src/config.cpp:209-220, src/workers/CombineGVCFsWorker.cpp:227-246)
maps to a 2-axis logical mesh:

* ``data``   — read-batch data parallelism (the reference's per-host MPI
  rank for bwa-flow, P5);
* ``region`` — genome-region parallelism (the reference's ncontigs process
  scatter, P1).

Single-host multi-chip uses ICI for both axes; multi-host puts ``data``
across hosts (DCN) and ``region`` within a host.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1     # -1: all remaining devices
    region: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        region = max(1, self.region)
        data = self.data if self.data > 0 else n_devices // region
        if data * region != n_devices:
            raise ValueError(
                f"mesh {data}x{region} != device count {n_devices}")
        return data, region


def make_mesh(spec: MeshSpec = MeshSpec(),
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    data, region = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, region)
    return Mesh(dev_array, axis_names=("data", "region"))


def distributed_initialize(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (replaces mpirun: jax.distributed.initialize).

    No-op when single-process (the common single-host case).
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
