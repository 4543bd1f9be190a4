"""Mutect2 scale rehearsal: tumor/normal somatic calling at 10 Mb.

The reference treats mutect2 as a first-class pipeline
(src/worker-mutect2.cpp:17-277); this records its scale evidence —
wall/RSS/sensitivity/precision on a 10 Mb tumor+normal pair (25× each)
with 1,000 planted somatic SNVs (35% VAF), 2,000 shared germline hets
(the matched normal must suppress them), and calibrated q30 quals at
0.1% sequencing error.

Writes a ``mutect2`` row into benchmarks/wgs_rehearsal.json.

Round 5 runs the same harness at 60 Mb (the germline-rehearsal scale,
worker-mutect2.cpp:170-201 runs every subcommand over the same
whole-genome scatter): set ``M2_G_MB=60``; the somatic/germline site
counts and the recorded row scale with it.

Usage: [M2_G_MB=60] python benchmarks/mutect2_rehearsal.py [workdir]
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

G_MB = int(os.environ.get("M2_G_MB", "10"))
G = G_MB * 1_000_000
DEPTH = 25
READ_LEN = 150
N_SOMATIC = 100 * G_MB          # 1,000 at the 10 Mb baseline scale
N_GERMLINE = 200 * G_MB
SOMATIC_VAF = 0.35
ERR = 0.001
QUAL_CHR = "?"          # phred 30 == the actual error rate (calibrated)


def _write_bam(path, ref, alt_hap, somatic, rng, sample, somatic_vaf):
    """Directly-constructed sorted BAM at DEPTH× (vectorized chunks)."""
    from falcon_genome_tpu.io.bam import BamColumnsWriter
    from falcon_genome_tpu.io.columns import RecordColumns
    from falcon_genome_tpu.io.dna import decode_seq
    from falcon_genome_tpu.io.sam import SamHeader, SamRecord, \
        cigar_from_str

    n_reads = G * DEPTH // READ_LEN
    header = SamHeader(
        contigs=[("chr1", G)],
        read_groups=[{"ID": f"rg-{sample}", "SM": sample}],
        sort_order="coordinate")
    w = BamColumnsWriter(str(path), header)
    CH = 200_000
    starts_all = np.sort(rng.integers(0, G - READ_LEN, n_reads))
    qual = QUAL_CHR * READ_LEN
    for a in range(0, n_reads, CH):
        b = min(a + CH, n_reads)
        starts = starts_all[a:b]
        n = b - a
        seqs = ref[starts[:, None] + np.arange(READ_LEN)[None, :]].copy()
        # germline hets: random half of covering reads take the alt hap
        # base; somatic (tumor only): somatic_vaf of covering reads
        for sites, frac in ((np.flatnonzero(alt_hap != ref), 0.5),
                            (somatic, somatic_vaf)):
            if len(sites) == 0:
                continue
            lo = np.searchsorted(starts, sites - READ_LEN + 1, "left")
            hi = np.searchsorted(starts, sites, "right")
            for si, site in enumerate(sites):
                cov = np.arange(lo[si], hi[si])
                if len(cov) == 0:
                    continue
                pick = cov[rng.random(len(cov)) < frac]
                col = site - starts[pick]
                ok = (col >= 0) & (col < READ_LEN)
                seqs[pick[ok], col[ok]] = (ref[site] + 1) % 4
        err = rng.random(seqs.shape) < ERR
        seqs = np.where(err, (seqs + rng.integers(1, 4, seqs.shape)) % 4,
                        seqs).astype(np.uint8)
        # half the reads reverse-strand (flag 0x10): orientation-bias
        # filtering needs both-strand support like real libraries have
        recs = [SamRecord(f"{sample}{a + i}", 0x10 * (i % 2), 0,
                          int(starts[i]), 60,
                          cigar_from_str(f"{READ_LEN}M"),
                          seq=decode_seq(seqs[i]), qual=qual)
                for i in range(n)]
        for r in recs:
            r.set_tag("RG", "Z", f"rg-{sample}")
        w.write_columns(RecordColumns.from_records(recs))
    w.close()
    return n_reads


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else f"/tmp/m2_{G_MB}mb")
    work.mkdir(parents=True, exist_ok=True)
    results_path = Path(__file__).parent / "wgs_rehearsal.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})

    from benchmarks.wgs_rehearsal import RssSampler  # noqa
    from falcon_genome_tpu import stages
    from falcon_genome_tpu.config import init as conf_init
    from falcon_genome_tpu.io.dna import decode_seq
    from falcon_genome_tpu.io.fasta import write_fasta
    from falcon_genome_tpu.io.vcf import read_vcf

    rng = np.random.default_rng(23)
    ref_fa = work / "ref.fa"
    tumor = work / "tumor.bam"
    normal = work / "normal.bam"
    truth_p = work / "somatic.npy"
    if not (ref_fa.exists() and tumor.exists() and normal.exists()):
        t0 = time.perf_counter()
        ref = rng.integers(0, 4, G).astype(np.uint8)
        write_fasta(ref_fa, {"chr1": decode_seq(ref)})
        sites = np.sort(rng.choice(np.arange(1000, G - 1000),
                                   N_SOMATIC + N_GERMLINE, replace=False))
        pick = rng.permutation(len(sites))
        somatic = np.sort(sites[pick[:N_SOMATIC]])
        germline = np.sort(sites[pick[N_SOMATIC:]])
        np.save(truth_p, somatic)
        alt_hap = ref.copy()
        alt_hap[germline] = (alt_hap[germline] + 1) % 4
        n_t = _write_bam(tumor, ref, alt_hap, somatic, rng, "TUMOR",
                         SOMATIC_VAF)
        n_n = _write_bam(normal, ref, alt_hap, np.zeros(0, np.int64),
                         rng, "NORMAL", 0.0)
        print(f"dataset: {n_t + n_n} reads in "
              f"{time.perf_counter() - t0:.0f}s")
    else:
        print("dataset cached")

    conf = conf_init(environ={})
    conf.set("temp_dir", str(work / "tmp"))
    conf.set("log_dir", str(work / "log"))
    out = work / "somatic.vcf.gz"
    sampler = RssSampler()
    t0 = time.perf_counter()
    stages.run_mutect2(conf, str(ref_fa), str(tumor), str(out),
                       normal_path=str(normal), force=True)
    wall = time.perf_counter() - t0
    peak = sampler.stop()

    truth = set(np.load(truth_p).tolist())
    _, recs = read_vcf(str(out))
    called = {r.pos - 1 for r in recs
              if not r.filter or r.filter in ("PASS", ".")}
    tp = len(truth & called)
    extra = len(called - truth)
    n_reads = 2 * (G * DEPTH // READ_LEN)
    results["mutect2"] = {
        "wall_s": round(wall, 1),
        "peak_rss_gb": round(peak, 2),
        "reads_per_s": round(n_reads / wall, 1),
        "genome_mb": G // 1_000_000,
        "somatic_sensitivity": round(tp / len(truth), 4),
        "extra_calls": extra,
        "precision": round(tp / max(len(called), 1), 5),
    }
    results_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results["mutect2"], indent=1))


if __name__ == "__main__":
    main()
