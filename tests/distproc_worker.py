"""Worker for the 2-process jax.distributed bring-up test (P6).

Run as: python distproc_worker.py <process_id> <coordinator>

Exercises the exact production path: ``tpu.dist.*`` config →
``initialize_from_conf`` → ``jax.distributed.initialize`` → a psum
collective across the two processes (the reference's mpirun hostfile
bring-up, src/Executor.cpp:231-267 / CombineGVCFsWorker.cpp:227-246).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from falcon_genome_tpu.config import Config, Machine  # noqa: E402
from falcon_genome_tpu.parallel.mesh import (  # noqa: E402
    get_active_mesh, initialize_from_conf)


def main() -> int:
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    conf = Config(machine=Machine(2, 4), environ={}, load_files=False)
    conf.set("tpu.dist.num_processes", 2)
    conf.set("tpu.dist.process_id", pid)
    conf.set("tpu.dist.coordinator", coordinator)
    mesh = initialize_from_conf(conf)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert mesh is not None and mesh.size == 2
    assert get_active_mesh() is mesh

    # one cross-process collective over the data axis (DCN-path psum)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.full((1,), float(pid + 1), np.float32), (2,))

    @jax.jit
    def total(v):
        return jnp.sum(v)

    got = float(np.asarray(jax.device_get(total(x))))
    assert got == 3.0, got   # 1 (proc 0) + 2 (proc 1)
    print(f"DISTOK {pid}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
