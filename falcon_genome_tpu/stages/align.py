"""``align`` stage: FASTQ → coordinate-sorted (optionally bucketed) BAM.

Mirrors the reference's align driver (src/worker-align.cpp:19-255): per
sample (sample-sheet loop), per read-group alignment, bucketed sorted
output with ``part-%06d.bam`` naming (BWAWorker's ``--num_buckets``), then
merge.  Compute is the in-repo aligner engine (minimizer seeding + TPU SW
extension) instead of a forked ``bwa-flow mem``.

Record emission is columnar end-to-end: alignments become RecordColumns
(vectorized, no per-read objects), sorting is a lexsort permutation, and
the native encoder writes BAM bytes with the permutation applied on the
fly (io/columns.py, fg_bam_encode).
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from ..aligner import AlignerEngine, AlignerParams, alignments_to_columns
from ..config import Config
from ..io.bam import write_bam_columns
from ..io.columns import F_FLAG, F_POS, F_TID, RecordColumns
from ..io.fastq import FastqReader
from ..io.sam import FLAG_UNMAPPED
from ..pipeline.runner import PipelineRunner, stage
from ..samples import SampleDetails, load_sample_sheet
from ..utils.common import check_input, check_output, get_bucket_fname

from .common import header_from_fasta, load_fasta, load_index

log = logging.getLogger("falcon_genome_tpu")


def _align_read_group(engine: AlignerEngine, det: SampleDetails,
                      batch_size: int) -> RecordColumns:
    reader = FastqReader(check_input(det.fastq1),
                         check_input(det.fastq2) if det.fastq2 else None,
                         batch_size=batch_size)
    from concurrent.futures import ThreadPoolExecutor

    def align(b1, b2):
        if b2 is not None:
            # mates align as ONE device batch with pair-aware selection
            # (proper-pair bonus + mate rescue)
            return engine.align_pair_batch(
                b1.codes, b1.lengths, b2.codes, b2.lengths)
        return engine.align_batch(b1.codes, b1.lengths), None

    def emit(b1, b2, res1, res2, parts):
        parts.append(alignments_to_columns(
            b1, res1, b2, res2, params=engine.params,
            read_group=det.read_group))

    # two-stage pipeline: batch N+1's device work runs in a worker thread
    # while this thread builds batch N's record columns (device waits
    # release the GIL, so host emission overlaps kernel time)
    parts: list[RecordColumns] = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = None            # (b1, b2, future)
        for b1, b2 in reader:
            fut = pool.submit(align, b1, b2)
            if pending is not None:
                p1, p2, pf = pending
                r1, r2 = pf.result()
                pending = (b1, b2, fut)
                emit(p1, p2, r1, r2, parts)
            else:
                pending = (b1, b2, fut)
        if pending is not None:
            p1, p2, pf = pending
            r1, r2 = pf.result()
            emit(p1, p2, r1, r2, parts)
    return RecordColumns.concat(parts)


def run_align(conf: Config, ref: str, output: str,
              fastq1: str | None = None, fastq2: str | None = None,
              sample_sheet: str | None = None,
              sample_id: str = "sample", read_group: str = "rg0",
              platform: str = "illumina", library: str = "lib0",
              num_buckets: int | None = None, merge: bool = True,
              force: bool = False) -> list[str]:
    """Returns the list of written BAM paths (one per sample)."""
    fa = load_fasta(ref)
    index = load_index(ref)
    engine = AlignerEngine(index, AlignerParams())
    batch_size = conf.get("tpu.batch.reads")

    if sample_sheet:
        sheet = load_sample_sheet(sample_sheet)
    else:
        if not fastq1:
            from ..utils.errors import MissingParam
            raise MissingParam("fastq1")
        sheet = {sample_id: [SampleDetails(fastq1, fastq2 or "",
                                           read_group, platform, library)]}

    outputs: list[str] = []
    multi = len(sheet) > 1
    for sid, details in sheet.items():
        out_path = str(Path(output) / f"{sid}.bam") if multi else output
        out_path = check_output(out_path, force)
        rgs = [{"ID": d.read_group, "SM": sid, "PL": d.platform_id,
                "LB": d.library_id} for d in details]
        header = header_from_fasta(fa, read_groups=rgs)

        runner = PipelineRunner(f"align[{sid}]", force=True)
        align_stage = stage(
            "bwa mem alignment",
            [(lambda d=d: _align_read_group(engine, d, batch_size))
             for d in details],
            nprocs=1)  # engine batches internally; one RG at a time
        (rg_results,) = runner.run([align_stage]).values()
        cols = RecordColumns.concat(list(rg_results))
        order = cols.coordinate_order()

        nb = num_buckets or 0
        if nb > 1:
            # bucketed sorted output (ref: bwa.num_buckets bucket tree)
            bucket_dir = Path(out_path).with_suffix("")
            bucket_dir.mkdir(parents=True, exist_ok=True)
            total = fa.dict.total_length()
            per = (total + nb - 1) // nb
            offs = np.zeros(len(fa.dict.contigs) + 1, np.int64)
            np.cumsum([c.length for c in fa.dict.contigs], out=offs[1:])
            tid = cols.fixed[:, F_TID].astype(np.int64)
            pos = cols.fixed[:, F_POS].astype(np.int64)
            unmapped = (cols.fixed[:, F_FLAG] & FLAG_UNMAPPED) != 0
            gpos = np.where(unmapped, total,
                            offs[np.maximum(tid, 0)] + np.maximum(pos, 0))
            bucket_id = np.minimum(gpos // per, nb - 1).astype(np.int64)
            bid_sorted = bucket_id[order]
            # order is coordinate-sorted → bucket ids are non-decreasing
            # except for the unmapped tail, which sorts last anyway
            bid_run = np.sort(bid_sorted, kind="stable")
            splits = np.searchsorted(bid_run, np.arange(nb + 1))
            order_by_bucket = order[np.argsort(bid_sorted, kind="stable")]
            for bi in range(nb):
                lo, hi = int(splits[bi]), int(splits[bi + 1])
                if lo == hi:
                    continue
                write_bam_columns(get_bucket_fname(bucket_dir, bi), header,
                                  cols, order=order_by_bucket[lo:hi])
        if merge or nb <= 1:
            write_bam_columns(out_path, header, cols, order=order)
            outputs.append(out_path)
        log.info("align[%s]: %d records → %s", sid, len(cols), out_path)
    return outputs
