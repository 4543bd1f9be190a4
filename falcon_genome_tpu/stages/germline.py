"""``germline`` stage: fused align → markdup → htc per sample.

Mirrors src/worker-germline.cpp:21-337 — the reference's one-command
end-to-end germline pipeline (align per read group, per-bucket sort,
HaplotypeCaller scatter, concat/zip) — the "minimum end-to-end slice"
(SURVEY.md §3.3).
"""
from __future__ import annotations

import logging
from pathlib import Path

from ..config import Config
from ..utils.common import check_output
from .align import run_align
from .bamstages import run_markdup
from .calling import run_htc

log = logging.getLogger("falcon_genome_tpu")


def run_germline(conf: Config, ref: str, output_vcf: str,
                 fastq1: str | None = None, fastq2: str | None = None,
                 sample_sheet: str | None = None,
                 sample_id: str = "sample", read_group: str = "rg0",
                 produce_vcf: bool = False, markdup: bool = True,
                 work_dir: str | None = None, long_reads: bool = False,
                 force: bool = False) -> str:
    # validate the final output BEFORE any alignment work (the reference
    # checks outputs in Worker::check() ahead of execution —
    # src/common.cpp:75-114); run_htc re-checks, by then it's gone/allowed
    check_output(output_vcf, force)
    work = Path(work_dir or (str(output_vcf) + ".work"))
    work.mkdir(parents=True, exist_ok=True)

    bam_paths = run_align(
        conf, ref, str(work / "aligned.bam"), fastq1=fastq1, fastq2=fastq2,
        sample_sheet=sample_sheet, sample_id=sample_id,
        read_group=read_group, long_reads=long_reads, force=True)
    bam = bam_paths[0]
    if markdup:
        bam = run_markdup(conf, bam, str(work / "dedup.bam"), force=True)
    return run_htc(conf, ref, bam, output_vcf, produce_vcf=produce_vcf,
                   sample=sample_id, force=force)
