"""Worker for the 2-process HTC stage test: each process runs the SAME
``run_htc`` call; the runner splits the shard scatter round-robin across
the jax.distributed processes and process 0 gathers the final VCF.

Run as: python distproc_htc_worker.py <pid> <coordinator> <work_dir>

This is the analog of the reference dispatching a stage's work across
hosts (ssh task dispatch src/Executor.cpp:231-267; ``mpirun -np #hosts``
in BWAWorker.cpp:97-130) — a real multi-process *stage* execution, not
just a collective bring-up.
"""
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
logging.basicConfig(level=logging.INFO, stream=sys.stdout)


def main() -> int:
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    work = Path(sys.argv[3])

    from falcon_genome_tpu import stages
    from falcon_genome_tpu.config import Config, Machine
    from falcon_genome_tpu.parallel.mesh import initialize_from_conf

    conf = Config(machine=Machine(2, 4), environ={}, load_files=False)
    conf.set("tpu.dist.num_processes", 2)
    conf.set("tpu.dist.process_id", pid)
    conf.set("tpu.dist.coordinator", coordinator)
    conf.set("gatk.ncontigs", 8)                 # 8 shards over 2 procs
    conf.set("log_dir", str(work / f"log{pid}"))
    initialize_from_conf(conf)
    assert jax.process_count() == 2

    out = work / "dist.vcf"
    stages.run_htc(conf, str(work / "ref.fa"), str(work / "in.bam"),
                   str(out), produce_vcf=True, force=True)
    if pid == 0:
        assert out.exists()
    print(f"DISTHTC {pid} OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
