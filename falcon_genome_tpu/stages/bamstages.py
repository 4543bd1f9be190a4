"""``markdup`` stage (and BAM-folder handling).

Mirrors src/worker-markdup.cpp:15-57 — a single markdup pass over a BAM
file or a bucket folder of ``part-%06d.bam`` shards (the reference's
SambambaWorker MARKDUP with its bucket-tree input, SambambaWorker.cpp).
"""
from __future__ import annotations

import logging
from pathlib import Path

from ..bamops import mark_duplicates, merge_sorted, sort_records
from ..config import Config
from ..io.bam import read_bam, write_bam
from ..utils.common import check_input, check_output, get_input_list

log = logging.getLogger("falcon_genome_tpu")


def load_bam_input(path: str):
    """BAM file or bucket folder → (header, records) (ref BamInput,
    src/BamInput.cpp:27-59)."""
    p = Path(path)
    if p.is_dir():
        parts = get_input_list(p, r"part-\d+.*\.bam")
        header = None
        shards = []
        for part in parts:
            h, recs = read_bam(part)
            header = header or h
            shards.append(recs)
        return header, merge_sorted(shards)
    check_input(path)
    return read_bam(path)


def run_markdup(conf: Config, input_path: str, output: str,
                force: bool = False) -> str:
    output = check_output(output, force)
    header, records = load_bam_input(input_path)
    records, ndup = mark_duplicates(records)
    records = sort_records(records)
    write_bam(output, header, records)
    log.info("markdup: %d records, %d duplicates → %s",
             len(records), ndup, output)
    return output
