import time, numpy as np, sys, tempfile, os
sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent.parent))
from falcon_genome_tpu.config import Config, Machine
from falcon_genome_tpu.io.dna import decode_seq, revcomp_codes
from falcon_genome_tpu.io.fasta import write_fasta
from falcon_genome_tpu.io.fastq import write_fastq
from falcon_genome_tpu.io.vcf import read_vcf
from falcon_genome_tpu import stages

rng = np.random.default_rng(1)
G = 200_000
chrom = rng.integers(0, 4, G).astype(np.uint8)
tmp = tempfile.mkdtemp()
ref = os.path.join(tmp, "ref.fa")
write_fasta(ref, {"chr20": decode_seq(chrom)})

# plant 100 het SNPs + 10 deletions
alt = chrom.copy()
truth_snps = sorted(rng.choice(np.arange(1000, G-1000), 100, replace=False))
for p in truth_snps:
    alt[p] = (alt[p] + 1) % 4

read_len, frag = 150, 350
names, s1, q1, s2, q2 = [], [], [], [], []
i = 0
for start in range(0, G - frag, 11):  # ~2*150/11 = 27x
    hap = alt if i % 2 else chrom
    names.append(f"f{start}")
    s1.append(decode_seq(hap[start:start+read_len])); q1.append("I"*read_len)
    s2.append(decode_seq(revcomp_codes(hap[start+frag-read_len:start+frag]))); q2.append("I"*read_len)
    i += 1
print(f"{len(names)} fragments ({2*len(names)} reads)")
fq1 = os.path.join(tmp, "r_1.fastq"); fq2 = os.path.join(tmp, "r_2.fastq")
write_fastq(fq1, names, s1, q1); write_fastq(fq2, names, s2, q2)

conf = Config(machine=Machine(8, 16), environ={}, load_files=False)
conf.set("gatk.ncontigs", 8)
out = os.path.join(tmp, "out.vcf.gz")
t0 = time.perf_counter()
stages.run_germline(conf, ref, out, fastq1=fq1, fastq2=fq2,
                    sample_id="s", produce_vcf=True, force=True)
dt = time.perf_counter() - t0
_, recs = read_vcf(out)
called = {r.pos - 1 for r in recs if not r.is_gvcf_block}
tp = sum(1 for p in truth_snps if p in called)
print(f"germline e2e: {dt:.1f}s ({2*len(names)/dt:.0f} reads/s end-to-end)")
print(f"sensitivity: {tp}/{len(truth_snps)}  extra calls: {len(called)-tp}")
