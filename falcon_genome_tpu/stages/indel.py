"""``indel`` stage: legacy indel realignment.

Mirrors the reference's RTCWorker → IndelWorker chain (SURVEY.md §2
row 22, src/workers/IndelWorker.cpp): RealignerTargetCreator finds
indel-evidence targets; IndelRealigner re-aligns reads over them.

Here target discovery is the active-region detector (indel-weighted) and
realignment is a batched Smith-Waterman of each overlapping read against
the target's reference window — reads whose fresh alignment scores
strictly better get their position/CIGAR rewritten.  (GATK4 dropped this
stage because haplotype-based calling subsumes it; it is provided for
reference-pipeline parity.)
"""
from __future__ import annotations

import logging

import numpy as np

from ..config import Config
from ..io.bam import write_bam
from ..io.dna import encode_seq
from ..io.sam import CIGAR_S, cigar_to_str
from ..models.activeregion import ActiveRegionParams, find_active_regions
from ..ops.smith_waterman import SWBucket, sw_extend_batch
from ..ops.sw_ref import SWParams
from ..utils.common import check_output
from .bamstages import load_bam_input
from .common import load_fasta

log = logging.getLogger("falcon_genome_tpu")


def run_indel(conf: Config, ref: str, input_path: str, output: str,
              force: bool = False) -> str:
    output = check_output(output, force)
    fa = load_fasta(ref)
    header, records = load_bam_input(input_path)
    params = SWParams()
    n_realigned = 0

    for tid, (cname, clen) in enumerate(header.contigs):
        if cname not in fa.dict.by_name:
            continue
        codes = fa.contig_codes(cname)
        contig_reads = [r for r in records if r.tid == tid
                        and not r.is_unmapped]
        if not contig_reads:
            continue
        targets = find_active_regions(
            contig_reads, codes, 0, clen,
            ActiveRegionParams(threshold=0.05, pad=40))
        for lo, hi in targets:
            # every read overlapping the target is a candidate: misaligned
            # reads typically carry plain mismatch-dense M CIGARs — the
            # strict score comparison below keeps only true improvements
            cand = [r for r in contig_reads
                    if r.pos < hi and r.end_pos > lo
                    and r.seq not in ("*", "")]
            if not cand:
                continue
            win = codes[lo:hi]
            maxr = max(len(r.seq) for r in cand)
            R = ((maxr + 31) // 32) * 32
            W = ((len(win) + 127) // 128) * 128
            reads = np.full((len(cand), maxr), 4, np.uint8)
            rl = np.zeros(len(cand), np.int32)
            for i, r in enumerate(cand):
                s = encode_seq(r.seq)
                reads[i, :len(s)] = s
                rl[i] = len(s)
            wins = np.tile(win, (len(cand), 1)).astype(np.uint8)
            wl = np.full(len(cand), len(win), np.int32)
            import jax
            bucket = SWBucket(
                max_read_len=R, max_win_len=W,
                backend="pallas" if jax.default_backend() == "tpu"
                else "jax")
            results = sw_extend_batch(reads, rl, wins, wl, params, bucket)
            for r, res in zip(cand, results):
                if res.score <= 0:
                    continue
                old_score = _score_current(r, codes, params)
                if res.score > old_score:
                    r.set_tag("OC", "Z", cigar_to_str(r.cigar))
                    r.pos = lo + res.ref_start
                    r.cigar = res.cigar
                    n_realigned += 1

    write_bam(output, header, records)
    log.info("indel: %d reads realigned → %s", n_realigned, output)
    return output


def _lead_clip(cigar) -> int:
    return cigar[0][1] if cigar and cigar[0][0] == CIGAR_S else 0


def _score_current(rec, codes: np.ndarray, p: SWParams) -> int:
    """Score the read's existing alignment under the SW scoring scheme."""
    from ..io.sam import CIGAR_D, CIGAR_I, CIGAR_M
    seq = encode_seq(rec.seq)
    score = 0
    i, rpos = 0, rec.pos
    for op, n in rec.cigar:
        if op == CIGAR_M:
            seg = seq[i:i + n]
            refseg = codes[rpos:rpos + n]
            m = min(len(seg), len(refseg))
            match = int((seg[:m] == refseg[:m]).sum())
            score += match * p.match - (m - match) * p.mismatch
            i += n
            rpos += n
        elif op == CIGAR_I:
            score -= p.gap_open + n * p.gap_ext
            i += n
        elif op == CIGAR_D:
            score -= p.gap_open + n * p.gap_ext
            rpos += n
        elif op == CIGAR_S:
            i += n
    return score
