"""Worker for the 2-process baserecal stage test: both processes run the
SAME ``run_baserecal``; the runner splits the shard scatter and only the
primary gathers/writes the table (stages/bqsr.py primary gating).

Run as: python distproc_bqsr_worker.py <pid> <coordinator> <work_dir>
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

    from falcon_genome_tpu.config import Config, Machine
    from falcon_genome_tpu.parallel.mesh import initialize_from_conf
    from falcon_genome_tpu.stages.bqsr import run_baserecal

    conf = Config(machine=Machine(2, 4), environ={}, load_files=False)
    conf.set("tpu.dist.num_processes", 2)
    conf.set("tpu.dist.process_id", pid)
    conf.set("tpu.dist.coordinator", coordinator)
    conf.set("gatk.ncontigs", 6)
    conf.set("gatk.bqsr.nprocs", 1)
    conf.set("log_dir", str(work / f"log{pid}"))
    initialize_from_conf(conf)
    assert jax.process_count() == 2

    out = work / "dist.recal.npz"
    run_baserecal(conf, str(work / "ref.fa"), str(work / "in.bam"),
                  str(out), force=True)
    if pid == 0:
        assert out.exists()
    print(f"DISTBQSR {pid} OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
