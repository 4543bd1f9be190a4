"""Long-read alignment at rehearsal scale (VERDICT round-5 item 6).

Generates an ONT-class read set over the 60 Mb rehearsal reference —
log-normal length mix (~5-25 kb, median ~10 kb), 5% error (60%
substitutions / 40% deletions, the bench_longread profile), both
strands — and runs the PRODUCTION ``align --long-reads`` stage
(minimap-flow analog, Minimap2Worker.cpp:51-106) end-to-end: FASTQ →
chained/checkpointed piecewise SW → sorted BAM.  Records stage-level
Mbp/s + reads/s + RSS + mapped fraction into
benchmarks/wgs_rehearsal.json as the ``longread`` row.

Usage: python benchmarks/longread_rehearsal.py [workdir] [total_mbp]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from wgs_rehearsal import RssSampler  # noqa: E402


def gen_reads(work: Path, ref_codes, total_bp: int, rng) -> Path:
    from falcon_genome_tpu.io.dna import decode_seq, revcomp_codes
    fq = work / "long_reads.fastq"
    if fq.exists():
        print("long-read FASTQ cached")
        return fq
    G = len(ref_codes)
    t0 = time.perf_counter()
    done = 0
    i = 0
    with open(fq, "w") as f:
        while done < total_bp:
            L = int(np.clip(rng.lognormal(np.log(10_000), 0.45),
                            3_000, 30_000))
            p = int(rng.integers(0, G - L))
            r = ref_codes[p:p + L].copy()
            err = rng.random(L) < 0.05
            sub = rng.random(L) < 0.6
            r[err & sub] = (r[err & sub] + 1) % 4
            r = r[~(err & ~sub)]                  # deletions
            if rng.random() < 0.5:
                r = revcomp_codes(r)
            f.write(f"@lr{i}\n{decode_seq(r)}\n+\n{'I' * len(r)}\n")
            done += len(r)
            i += 1
    print(f"{i} reads / {done / 1e6:.0f} Mbp in "
          f"{time.perf_counter() - t0:.0f}s")
    return fq


def main() -> None:
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgs60")
    total_mbp = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from falcon_genome_tpu import stages
    from falcon_genome_tpu.config import init as conf_init
    from falcon_genome_tpu.io.fasta import FastaFile

    ref = work / "ref.fa"
    if not ref.exists():
        raise SystemExit("needs the rehearsal reference")
    fa = FastaFile(str(ref))
    codes = fa.contig_codes(fa.dict.contigs[0].name)
    rng = np.random.default_rng(77)
    fq = gen_reads(work, codes, int(total_mbp * 1e6), rng)
    n_reads = sum(1 for _ in open(fq)) // 4
    total_bp = sum(len(l) - 1 for i, l in enumerate(open(fq))
                   if i % 4 == 1)

    conf = conf_init(environ={})
    conf.set("temp_dir", str(work / "tmp"))
    conf.set("log_dir", str(work / "log"))
    out = work / "long_aligned.bam"

    # warm-up: a tiny slice through the same stage primes the XLA
    # compile cache (in-process); the row measures steady throughput,
    # not cold-start — production runs amortize compiles over WGS-scale
    # inputs
    warm_fq = work / "long_warm.fastq"
    with open(fq) as src, open(warm_fq, "w") as dst:
        for i, line in enumerate(src):
            if i >= 4 * 8:
                break
            dst.write(line)
    stages.run_align(conf, str(ref), str(work / "long_warm.bam"),
                     fastq1=str(warm_fq), sample_id="warm",
                     long_reads=True, force=True)

    sampler = RssSampler()
    t0 = time.perf_counter()
    stages.run_align(conf, str(ref), str(out), fastq1=str(fq),
                     sample_id="lr", long_reads=True, force=True)
    wall = time.perf_counter() - t0
    rss = sampler.stop()

    from falcon_genome_tpu.io.bam import read_bam
    _, recs = read_bam(str(out))
    mapped = sum(1 for r in recs if not r.is_unmapped)

    row = {"wall_s": round(wall, 1), "peak_rss_gb": round(rss, 2),
           "reads": n_reads, "total_mbp": round(total_bp / 1e6, 1),
           "mbp_per_s": round(total_bp / 1e6 / wall, 3),
           "reads_per_s": round(n_reads / wall, 1),
           "mapped_frac": round(mapped / max(n_reads, 1), 4)}
    results_path = Path(__file__).parent / "wgs_rehearsal.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})
    results["longread"] = row
    results_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
