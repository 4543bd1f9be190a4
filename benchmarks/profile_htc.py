"""Profile the HaplotypeCaller host path at mid scale.

Simulates a 2 Mb contig at ~15x with planted het SNPs and runs
call_interval under cProfile to find the host-loop offenders
(round-3 agenda item 5).
"""
import cProfile
import os
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
if os.environ.get("HTC_CPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
if os.environ.get("HTC_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from falcon_genome_tpu.io.dna import decode_seq
from falcon_genome_tpu.io.sam import CIGAR_M, SamRecord
from falcon_genome_tpu.models.haplotypecaller import HaplotypeCaller, HTCParams

rng = np.random.default_rng(7)
G = 2_000_000
ref = rng.integers(0, 4, G).astype(np.uint8)
alt = ref.copy()
# planted het SNPs on a strided grid (≥900 bp apart) so adjacent sites
# can't merge into MNP/complex calls whose pos matches neither truth site
snps = np.arange(1000, G - 1000, 900)
snps = np.sort(rng.choice(snps, 2000, replace=False))
for p in snps:
    alt[p] = (alt[p] + 1) % 4

read_len = 150
step = 10  # one 150bp read per 10bp start = 15x (half ref-hap, half alt-hap)
records = []
i = 0
for start in range(0, G - read_len, step):
    hap = alt if i % 2 else ref
    seq = hap[start:start + read_len].copy()
    # 0.2% sequencing error
    errs = rng.random(read_len) < 0.002
    seq[errs] = (seq[errs] + rng.integers(1, 4, errs.sum())) % 4
    records.append(SamRecord(
        qname=f"r{i}", flag=0, tid=0, pos=start, mapq=60,
        cigar=[(CIGAR_M, read_len)], seq=decode_seq(seq),
        qual="I" * read_len))
    i += 1
print(f"{len(records)} reads over {G/1e6:.1f} Mb (~{len(records)*read_len/G:.0f}x)")

hc = HaplotypeCaller(HTCParams())

t0 = time.perf_counter()
prof = cProfile.Profile()
prof.enable()
out = hc.call_interval(records, ref, "chr1", 0, G)
prof.disable()
dt = time.perf_counter() - t0

called = {r.pos - 1 for r in out}
tp = sum(1 for p in snps if p in called)
print(f"call_interval: {dt:.1f}s  ({len(records)/dt:.0f} reads/s)  "
      f"calls={len(out)} tp={tp}/{len(snps)}")
st = pstats.Stats(prof)
st.dump_stats("/tmp/htc_profile.pstats")
st.sort_stats("cumulative").print_stats(25)
print("\n==== callers of numpy.asarray / numpy.full ====")
st.print_callers("numpy.asarray")
st.print_callers("numeric.py:300")
