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

The data plane is the shared columnar input (BamInputSource): shards
stream via the ``.bai`` index at scale, record objects materialize only
per shard for the irregular target/realign work, and the realigned
columns merge through one coordinate sort — the same per-contig scatter
the reference runs (IndelWorker ×ncontigs with ``-L``; like GATK's
``-L``, unmapped reads fall outside every interval).
"""
from __future__ import annotations

import logging

import numpy as np

from ..config import Config
from ..io.bam import write_bam_columns
from ..io.columns import RecordColumns
from ..io.dna import encode_seq
from ..io.sam import CIGAR_S, cigar_to_str
from ..models.activeregion import ActiveRegionParams, find_active_regions
from ..ops.smith_waterman import SWBucket, sw_extend_batch
from ..ops.sw_ref import SWParams
from ..pipeline.runner import PipelineRunner, stage
from ..utils.common import check_output
from .bamstages import BamInputSource
from .common import interval_shards, load_fasta

log = logging.getLogger("falcon_genome_tpu")


def _realign_interval(reads, codes: np.ndarray, lo0: int, hi0: int,
                      params: SWParams) -> int:
    """RTC + realignment over one interval's reads (in place)."""
    import jax

    live = [r for r in reads if not r.is_unmapped
            and r.seq not in ("*", "")]
    if not live:
        return 0
    targets = find_active_regions(
        live, codes, lo0, hi0, ActiveRegionParams(threshold=0.05, pad=40))
    n_realigned = 0
    for lo, hi in targets:
        # every read overlapping the target is a candidate: misaligned
        # reads typically carry plain mismatch-dense M CIGARs — the
        # strict score comparison below keeps only true improvements
        cand = [r for r in live if r.pos < hi and r.end_pos > lo]
        if not cand:
            continue
        win = codes[lo:hi]
        maxr = max(len(r.seq) for r in cand)
        R = ((maxr + 31) // 32) * 32
        W = ((len(win) + 127) // 128) * 128
        rarr = np.full((len(cand), maxr), 4, np.uint8)
        rl = np.zeros(len(cand), np.int32)
        for i, r in enumerate(cand):
            s = encode_seq(r.seq)
            rarr[i, :len(s)] = s
            rl[i] = len(s)
        wins = np.tile(win, (len(cand), 1)).astype(np.uint8)
        wl = np.full(len(cand), len(win), np.int32)
        bucket = SWBucket(
            max_read_len=R, max_win_len=W,
            backend="pallas" if jax.default_backend() == "tpu"
            else "jax")
        results = sw_extend_batch(rarr, rl, wins, wl, params, bucket)
        for r, res in zip(cand, results):
            if res.score <= 0:
                continue
            old_score = _score_current(r, codes, params)
            if res.score > old_score:
                r.set_tag("OC", "Z", cigar_to_str(r.cigar))
                r.pos = lo + res.ref_start
                r.cigar = res.cigar
                n_realigned += 1
    return n_realigned


def run_indel(conf: Config, ref: str, input_path: str, output: str,
              force: bool = False,
              extra_opts: list[str] | None = None) -> str:
    from ..utils.extraopts import ExtraOpts
    xo = ExtraOpts(extra_opts)
    xo.warn_unused("indel")
    output = check_output(output, force)
    fa = load_fasta(ref)
    src = BamInputSource.from_conf(conf, input_path)
    header = src.header
    params = SWParams()
    shards = [s for s in interval_shards(conf, fa) if s]
    runner = PipelineRunner.from_conf("Indel Realignment", conf,
                                      force=force)
    from pathlib import Path

    from ..utils.common import get_contig_fname
    parts_root = Path(str(output) + ".parts")
    part_paths = [get_contig_fname(str(parts_root), i, "bam")
                  for i in range(len(shards))]

    def one(shard, idx):
        parts = []
        n_re = 0
        for iv in shard:
            if iv.contig not in fa.dict.by_name:
                continue
            # by_start: a partition — each record realigns in exactly
            # one shard and is emitted once
            cols = src.columns_for([iv], by_start=True)
            if len(cols) == 0:
                continue
            recs = cols.to_records()
            codes = fa.contig_codes(iv.contig)
            n_re += _realign_interval(recs, codes, iv.start - 1, iv.end,
                                      params)
            parts.append(RecordColumns.from_records(recs))
        import os
        parts_root.mkdir(parents=True, exist_ok=True)
        out_cols = (RecordColumns.concat(parts) if parts
                    else RecordColumns.from_records([]))
        path = part_paths[idx]
        tmp = path + ".tmp.bam"
        write_bam_columns(tmp, header, out_cols,
                          order=out_cols.coordinate_order(), index=False)
        os.replace(tmp, path)
        return path, n_re

    tasks = [(lambda s=s, i=i: one(s, i)) for i, s in enumerate(shards)]
    (results,) = runner.run([stage(
        "IndelRealigner", tasks, outputs=part_paths,
        nprocs=conf.get("gatk.nprocs"))]).values()
    n_realigned = sum(r[1] for r in results if isinstance(r, tuple))
    # shard-by-shard streamed merge: one part resident at a time; the
    # slack window absorbs realignment moves across shard boundaries
    # (bounded by the active-region pad)
    import shutil

    from .bamstages import stream_merge_sorted_parts
    next_keys = [
        (header.tid(shards[i + 1][0].contig),
         shards[i + 1][0].start - 1) if i + 1 < len(shards) else None
        for i in range(len(shards))]
    stream_merge_sorted_parts(output, header, part_paths, next_keys)
    shutil.rmtree(parts_root, ignore_errors=True)
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
