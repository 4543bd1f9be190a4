"""HaplotypeCaller: germline variant calling over active regions.

End-to-end equivalent of the per-contig ``HTCWorker`` GATK invocations the
reference schedules (SURVEY.md §2 row 13, src/workers/HTCWorker.cpp),
including the PairHMM the reference offloads to the Blaze NAM FPGA — here
the in-process Pallas kernel (ops/pairhmm.py).

Per interval shard:
  pileup → active regions → de Bruijn assembly → PairHMM read×hap
  likelihoods (TPU batch) → diploid genotyping → VCF records (or gVCF
  with reference blocks).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..io.dna import encode_seq
from ..io.sam import CIGAR_D, CIGAR_M, SamRecord, cigar_ref_len
from ..io.vcf import VcfRecord
from ..ops.pairhmm import PairHMMParams, pairhmm_logp
from .activeregion import ActiveRegionParams, find_active_regions
from .assembly import AssemblyParams, assemble_region
from .genotyper import (
    events_from_alignment, genotype_sites, site_to_vcf_record)


@dataclasses.dataclass
class HTCParams:
    active: ActiveRegionParams = dataclasses.field(
        default_factory=ActiveRegionParams)
    assembly: AssemblyParams = dataclasses.field(
        default_factory=AssemblyParams)
    pairhmm: PairHMMParams | None = None
    max_reads_per_region: int = 256
    min_mapq: int = 10
    min_call_qual: float = 10.0
    emit_gvcf: bool = False
    gcp: int = 10                    # gap-continuation penalty phred
    sample: str = "SAMPLE"


def _hap_to_ref_events(haps: list[np.ndarray], ref: np.ndarray):
    """Align each assembled hap to the region reference; extract events."""
    from ..ops.smith_waterman import SWBucket, sw_extend_batch
    from ..ops.sw_ref import SWParams

    if len(haps) == 1:
        return [[]]
    n = len(haps) - 1
    maxh = max(len(h) for h in haps[1:])
    R = ((max(maxh, len(ref), 32) + 31) // 32) * 32
    W = max(((len(ref) + 127) // 128) * 128, 128)
    reads = np.full((n, R), 4, np.uint8)
    rl = np.zeros(n, np.int32)
    for i, h in enumerate(haps[1:]):
        reads[i, :len(h)] = h
        rl[i] = len(h)
    wins = np.tile(ref, (n, 1)).astype(np.uint8)
    wl = np.full(n, len(ref), np.int32)
    # hap-to-ref uses GATK-ish heavier gap penalties to canonicalize indels
    params = SWParams(match=2, mismatch=6, gap_open=12, gap_ext=1)
    import jax
    bucket = SWBucket(max_read_len=R, max_win_len=W,
                      backend="pallas" if jax.default_backend() == "tpu"
                      else "jax")
    results = sw_extend_batch(reads, rl, wins, wl, params, bucket)
    events = [[]]  # haplotype 0 = reference
    for i, res in enumerate(results):
        events.append(events_from_alignment(reads[i, :rl[i]], ref, res)
                      if res.score > 0 else None)
    return events


class HaplotypeCaller:
    def __init__(self, params: HTCParams = None):
        self.params = params or HTCParams()

    def call_region(self, records: list[SamRecord], ref: np.ndarray,
                    contig: str, rstart: int, rend: int
                    ) -> list[VcfRecord]:
        """Genotype one active region [rstart, rend) on ``contig``."""
        p = self.params
        region_ref = ref[rstart:rend]

        reads = [r for r in records
                 if not r.is_unmapped and not r.is_duplicate
                 and not (r.flag & 0x900) and r.mapq >= p.min_mapq
                 and r.pos < rend and r.end_pos > rstart
                 and r.seq not in ("*", "")]
        reads = reads[:p.max_reads_per_region]
        if not reads:
            return []

        read_codes = [encode_seq(r.seq) for r in reads]
        asm = assemble_region(region_ref, read_codes, p.assembly)
        haps = asm.haplotypes
        if len(haps) == 1:
            return []

        hap_events = _hap_to_ref_events(haps, region_ref)

        # PairHMM batch: all read×hap pairs
        n_r, n_h = len(reads), len(haps)
        maxrl = max(len(c) for c in read_codes)
        maxhl = max(len(h) for h in haps)
        codes = np.full((n_r * n_h, maxrl), 4, np.uint8)
        quals = np.zeros((n_r * n_h, maxrl), np.uint8)
        gcps = np.full((n_r * n_h, maxrl), p.gcp, np.uint8)
        rlens = np.zeros(n_r * n_h, np.int32)
        hcodes = np.full((n_r * n_h, maxhl), 4, np.uint8)
        hlens = np.zeros(n_r * n_h, np.int32)
        for ri, (rec, rc) in enumerate(zip(reads, read_codes)):
            q = np.frombuffer(rec.qual.encode(), np.uint8) - 33 \
                if rec.qual not in ("*", "") else np.full(len(rc), 30,
                                                          np.uint8)
            for hi, h in enumerate(haps):
                b = ri * n_h + hi
                codes[b, :len(rc)] = rc
                quals[b, :len(q)] = q
                rlens[b] = len(rc)
                hcodes[b, :len(h)] = h
                hlens[b] = len(h)
        phmm = p.pairhmm or _default_pairhmm_params(maxrl, maxhl)
        logp = np.asarray(pairhmm_logp(
            codes, quals, np.full_like(quals, 45), np.full_like(quals, 45),
            gcps, rlens, hcodes, hlens, params=phmm))
        read_hap_logp = logp.reshape(n_r, n_h)

        calls = genotype_sites(hap_events, read_hap_logp)
        out = []
        for c in calls:
            if c.qual < p.min_call_qual:
                continue
            if c.gt == (0, 0) and not p.emit_gvcf:
                continue
            out.append(site_to_vcf_record(c, contig, rstart))
        return out

    def call_interval(self, records: list[SamRecord], ref: np.ndarray,
                      contig: str, start: int, end: int) -> list[VcfRecord]:
        """Full sharded-caller step: detect active regions then genotype."""
        p = self.params
        regions = find_active_regions(records, ref, start, end, p.active)
        out: list[VcfRecord] = []
        for rstart, rend in regions:
            out.extend(self.call_region(records, ref, contig, rstart, rend))
        out.sort(key=lambda r: r.pos)
        # drop duplicate sites from overlapping regions
        dedup: list[VcfRecord] = []
        seen = set()
        for r in out:
            key = (r.pos, r.ref, tuple(r.alts))
            if key not in seen:
                seen.add(key)
                dedup.append(r)
        if p.emit_gvcf:
            dedup = _add_ref_blocks(dedup, records, ref, contig, start, end)
        return dedup


def _default_pairhmm_params(maxrl: int, maxhl: int) -> PairHMMParams:
    import jax
    R = ((max(maxrl, 8) + 7) // 8) * 8
    H = ((max(maxhl, 8) + 127) // 128) * 128
    return PairHMMParams(
        max_read_len=R, max_hap_len=H,
        backend="pallas" if jax.default_backend() == "tpu" else "jax")


def _add_ref_blocks(variants: list[VcfRecord], records: list[SamRecord],
                    ref: np.ndarray, contig: str, start: int, end: int
                    ) -> list[VcfRecord]:
    """gVCF mode: fill non-variant spans with <NON_REF> reference blocks.

    Block GQ is depth-derived (min depth in the block, capped at 99) and
    blocks are banded at GQ breakpoints {0, 20, 60} like GATK's standard
    bands.
    """
    from ..io.dna import decode_seq

    depth = np.zeros(end - start, np.int32)
    for rec in records:
        if rec.is_unmapped or rec.is_duplicate or rec.flag & 0x900:
            continue
        lo = max(rec.pos, start)
        hi = min(rec.pos + cigar_ref_len(rec.cigar), end)
        if lo < hi:
            depth[lo - start:hi - start] += 1

    def band(gq: int) -> int:
        if gq >= 60:
            return 60
        if gq >= 20:
            return 20
        return 0

    var_pos = {v.pos - 1 for v in variants}  # 0-based
    out: list[VcfRecord] = []
    vi = 0
    pos = start
    while pos < end:
        if pos in var_pos:
            while vi < len(variants) and variants[vi].pos - 1 == pos:
                out.append(variants[vi])
                vi += 1
            pos += 1
            continue
        # start a ref block
        bstart = pos
        gq0 = band(min(99, int(depth[pos - start]) * 3))
        while (pos < end and pos not in var_pos and
               band(min(99, int(depth[pos - start]) * 3)) == gq0):
            pos += 1
        out.append(VcfRecord(
            contig=contig, pos=bstart + 1,
            ref=decode_seq(ref[bstart:bstart + 1]),
            alts=["<NON_REF>"], qual=None, filter=".",
            info={"END": pos},
            fmt=["GT", "DP", "GQ"],
            samples=[{"GT": "0/0",
                      "DP": int(depth[bstart - start]),
                      "GQ": min(99, int(depth[bstart - start]) * 3)}]))
    # any variants not at positions seen (shouldn't happen) are appended
    out.extend(variants[vi:])
    out.sort(key=lambda r: r.pos)
    return out
