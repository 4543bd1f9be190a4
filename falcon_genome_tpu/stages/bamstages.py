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
from ..io.bam import BamReader, read_bam, read_bam_region, write_bam
from ..utils.common import check_input, check_output, get_input_list

log = logging.getLogger("falcon_genome_tpu")


class BamInputSource:
    """Shard-aware BAM input for scatter stages.

    Small inputs load whole (one decode shared by every shard task);
    inputs above the ``tpu.bam.stream_mb`` threshold with a ``.bai``
    stream each shard's region straight from the indexed BGZF blocks —
    bounded memory at WGS scale, no whole-file materialization."""

    def __init__(self, path: str, stream_threshold_bytes: int = 256 << 20):
        from .common import records_in_shard
        self._in_shard = records_in_shard
        p = Path(path)
        self.path = p
        self.stream = (p.is_file()
                       and Path(str(p) + ".bai").exists()
                       and p.stat().st_size > stream_threshold_bytes)
        if self.stream:
            with BamReader(p) as r:
                self.header = r.header
            self._records = None
        else:
            self.header, self._records = load_bam_input(path)

    @classmethod
    def from_conf(cls, conf: Config, path: str) -> "BamInputSource":
        return cls(path, conf.get("tpu.bam.stream_mb") << 20)

    def records_for(self, shard) -> list:
        """Records overlapping a shard (list of Intervals), mapped only."""
        if self.stream:
            _, recs = read_bam_region(
                self.path,
                [(iv.contig, iv.start - 1, iv.end) for iv in shard])
            return recs
        return self._in_shard(self._records, shard, self.header)

    @property
    def records(self) -> list:
        """All records (whole-file mode only callers)."""
        if self._records is None:
            self.header, self._records = read_bam(self.path)
        return self._records


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
