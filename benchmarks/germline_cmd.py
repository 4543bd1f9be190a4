"""One-command germline rehearsal (VERDICT round-5 item 8).

The reference's flagship is the FUSED germline pipeline
(worker-germline.cpp:21-337: align → markdup → bqsr → htc in one
command); the round-4 rehearsal measured the chain stage by stage.
This runs the single ``germline`` CLI entry end-to-end on the same
60 Mb / 10 M-read dataset and records one wall number + accuracy —
expected within ~5% of the sum of the stage rows.

Usage: python benchmarks/germline_cmd.py [workdir]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from wgs_rehearsal import RssSampler  # noqa: E402


def main() -> None:
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgs60")
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from falcon_genome_tpu import stages
    from falcon_genome_tpu.config import init as conf_init
    from falcon_genome_tpu.io.vcf import read_vcf

    conf = conf_init(environ={})
    conf.set("temp_dir", str(work / "tmp"))
    conf.set("log_dir", str(work / "log"))
    out = work / "germline_cmd.vcf.gz"
    gwork = work / "germline_cmd_work"

    sampler = RssSampler()
    t0 = time.perf_counter()
    stages.run_germline(conf, str(work / "ref.fa"), str(out),
                        fastq1=str(work / "r_1.fastq"),
                        fastq2=str(work / "r_2.fastq"),
                        sample_id="s", produce_vcf=True, force=True,
                        work_dir=str(gwork))
    wall = time.perf_counter() - t0
    rss = sampler.stop()

    truth = set(np.load(work / "truth.npy").tolist())
    _, recs = read_vcf(str(out))
    called = {r.pos - 1 for r in recs if not r.is_gvcf_block}
    tp = len(truth & called)
    row = {"wall_s": round(wall, 1), "peak_rss_gb": round(rss, 2),
           "reads_per_s": round(10_000_000 / wall, 1),
           "sensitivity": round(tp / len(truth), 4),
           "extra_calls": len(called - truth),
           "precision": round(tp / max(len(called), 1), 5)}
    results_path = Path(__file__).parent / "wgs_rehearsal.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})
    results["germline_cmd"] = row
    results_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
