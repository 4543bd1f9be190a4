"""``align`` stage: FASTQ → coordinate-sorted (optionally bucketed) BAM.

Mirrors the reference's align driver (src/worker-align.cpp:19-255): per
sample (sample-sheet loop), per read-group alignment, bucketed sorted
output with ``part-%06d.bam`` naming (BWAWorker's ``--num_buckets``), then
merge.  Compute is the in-repo aligner engine (minimizer seeding + TPU SW
extension) instead of a forked ``bwa-flow mem``.
"""
from __future__ import annotations

import logging
from pathlib import Path

from ..aligner import AlignerEngine, AlignerParams, make_sam_records
from ..bamops import sort_records
from ..config import Config
from ..io.bam import write_bam
from ..io.fastq import FastqReader
from ..io.sam import SamRecord
from ..pipeline.runner import PipelineRunner, stage
from ..samples import SampleDetails, load_sample_sheet
from ..utils.common import check_input, check_output, get_bucket_fname
from .common import header_from_fasta, load_fasta, load_index

log = logging.getLogger("falcon_genome_tpu")


def _align_read_group(engine: AlignerEngine, det: SampleDetails,
                      batch_size: int) -> list[SamRecord]:
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

    def emit(b1, b2, res1, res2, records):
        for i, name in enumerate(b1.names):
            seq1 = _seq_str(b1, i)
            qual1 = _qual_str(b1, i)
            if res2 is not None:
                recs = make_sam_records(
                    name, seq1, qual1, res1[i],
                    _seq_str(b2, i), _qual_str(b2, i), res2[i],
                    params=engine.params, read_group=det.read_group)
            else:
                recs = make_sam_records(
                    name, seq1, qual1, res1[i],
                    params=engine.params, read_group=det.read_group)
            records.extend(recs)

    # two-stage pipeline: batch N+1's device work runs in a worker thread
    # while this thread builds batch N's SAM records (device waits release
    # the GIL, so host record emission overlaps kernel time)
    records: list[SamRecord] = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = None            # (b1, b2, future)
        for b1, b2 in reader:
            fut = pool.submit(align, b1, b2)
            if pending is not None:
                p1, p2, pf = pending
                r1, r2 = pf.result()
                pending = (b1, b2, fut)
                emit(p1, p2, r1, r2, records)
            else:
                pending = (b1, b2, fut)
        if pending is not None:
            p1, p2, pf = pending
            r1, r2 = pf.result()
            emit(p1, p2, r1, r2, records)
    return records


def _seq_str(batch, i) -> str:
    from ..io.dna import decode_seq
    return decode_seq(batch.codes[i, :batch.lengths[i]])


def _qual_str(batch, i) -> str:
    q = batch.quals[i, :batch.lengths[i]]
    import numpy as np
    return (q.astype(np.uint8) + 33).tobytes().decode()


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
        records = [r for rg in rg_results for r in rg]
        records = sort_records(records)

        nb = num_buckets or 0
        if nb > 1:
            # bucketed sorted output (ref: bwa.num_buckets bucket tree)
            bucket_dir = Path(out_path).with_suffix("")
            bucket_dir.mkdir(parents=True, exist_ok=True)
            total = fa.dict.total_length()
            per = (total + nb - 1) // nb
            offs = {c.name: sum(x.length for x in fa.dict.contigs[:i])
                    for i, c in enumerate(fa.dict)}
            buckets: dict[int, list[SamRecord]] = {}
            for r in records:
                g = (offs.get(header.contig_name(r.tid), 0) + max(r.pos, 0)
                     if not r.is_unmapped else total)
                buckets.setdefault(min(int(g // per), nb - 1), []).append(r)
            for bi, recs in sorted(buckets.items()):
                write_bam(get_bucket_fname(bucket_dir, bi), header, recs)
        if merge or nb <= 1:
            write_bam(out_path, header, records)
            outputs.append(out_path)
        log.info("align[%s]: %d records → %s", sid, len(records), out_path)
    return outputs
