"""Indel realignment at germline-rehearsal scale (60 Mb / 10 M reads).

Runs ``run_indel`` over the rehearsal dedup BAM (the reference runs
IndelWorker over the same whole-genome scatter as every other
subcommand, worker-indel.cpp:17-125) and records wall/RSS + the
realigned-read count into benchmarks/wgs_rehearsal.json.

Usage: python benchmarks/indel_rehearsal.py [workdir]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from wgs_rehearsal import RssSampler  # noqa: E402


def main() -> None:
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgs60")
    bam = work / "dedup.bam"
    if not bam.exists():
        raise SystemExit("needs the rehearsal dedup BAM "
                         "(run wgs_rehearsal.py first)")
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from falcon_genome_tpu.config import init as conf_init
    conf = conf_init(environ={})
    conf.set("temp_dir", str(work / "tmp"))
    conf.set("log_dir", str(work / "log"))

    from falcon_genome_tpu import stages
    out = work / "realigned.bam"
    sampler = RssSampler()
    t0 = time.perf_counter()
    stages.run_indel(conf, str(work / "ref.fa"), str(bam), str(out),
                     force=True)
    wall = time.perf_counter() - t0
    rss = sampler.stop()

    results_path = Path(__file__).parent / "wgs_rehearsal.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})
    genome_mb = 60
    results["indel"] = {"wall_s": round(wall, 1),
                        "peak_rss_gb": round(rss, 2),
                        "genome_mb": genome_mb,
                        "reads": 10_000_000,
                        "s_per_mb": round(wall / genome_mb, 1)}
    results_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results["indel"], indent=1))


if __name__ == "__main__":
    main()
