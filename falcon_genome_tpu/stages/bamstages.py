"""``markdup`` stage (and BAM-folder handling).

Mirrors src/worker-markdup.cpp:15-57 — a single markdup pass over a BAM
file or a bucket folder of ``part-%06d.bam`` shards (the reference's
SambambaWorker MARKDUP with its bucket-tree input, SambambaWorker.cpp).

The data plane is columnar end-to-end: BAM bytes → native scan →
RecordColumns → vectorized dup keys → native encode, with no per-record
Python objects (records materialize only for the irregular consumers —
HaplotypeCaller active regions — via ``records_for``).
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from ..bamops import mark_duplicates_columns
from ..config import Config
from ..io.bam import (
    BamReader, read_bam_columns, read_bam_region_columns, write_bam_columns)
from ..io.columns import (
    F_ENDPOS, F_FLAG, F_LNAME, F_POS, F_TID, RecordColumns)
from ..io.sam import FLAG_UNMAPPED
from ..utils.common import (
    check_input, check_output, get_input_list, rss_suffix)

log = logging.getLogger("falcon_genome_tpu")


def _columns_sorted(cols: RecordColumns) -> RecordColumns:
    order = cols.coordinate_order()
    if np.array_equal(order, np.arange(len(cols))):
        return cols            # already coordinate-sorted: no copy
    return cols.take(order)


def load_bam_input_columns(path: str) -> tuple[object, RecordColumns]:
    """BAM file or bucket folder → (header, coordinate-sorted columns)
    (ref BamInput, src/BamInput.cpp:27-59)."""
    p = Path(path)
    if p.is_dir():
        parts = get_input_list(p, r"part-\d+.*\.bam")
        header = None
        shards = []
        for part in parts:
            h, cols = read_bam_columns(part)
            header = header or h
            shards.append(cols)
        return header, _columns_sorted(RecordColumns.concat(shards))
    check_input(path)
    return read_bam_columns(path)


def load_bam_input(path: str):
    """Object-path twin of load_bam_input_columns (tests, small callers)."""
    header, cols = load_bam_input_columns(path)
    return header, cols.to_records()


class BamInputSource:
    """Shard-aware columnar BAM input for scatter stages.

    Small inputs load whole as RecordColumns (one native decode shared by
    every shard task); inputs above the ``tpu.bam.stream_mb`` threshold
    with a ``.bai`` stream each shard's region straight from the indexed
    BGZF blocks — bounded memory at WGS scale, no whole-file
    materialization.

    A bucket-FOLDER input whose parts carry ``.list``/``.bed`` region
    sidecars (printreads writes them, stages/bqsr.py) is pruned per
    shard: only parts whose declared regions intersect the shard are
    decoded — the reference's per-bucket region merge
    (src/BamInput.cpp:73-149)."""

    def __init__(self, path: str, stream_threshold_bytes: int = 256 << 20):
        p = Path(path)
        self.path = p
        self.parts: list[str] | None = None
        self._cols: RecordColumns | None = None
        self.stream = False
        if p.is_dir():
            parts = get_input_list(p, r"part-\d+.*\.bam")
            regions = []
            for part in parts:
                have = None
                for ext in (".list", ".bed"):
                    side = Path(part).with_suffix(ext)
                    if side.exists():
                        from ..io.intervals import read_interval_list
                        have = read_interval_list(side)
                        break
                regions.append(have)
            total = sum(Path(x).stat().st_size for x in parts)
            if (parts and all(r is not None for r in regions)
                    and total > stream_threshold_bytes):
                # region-pruned streaming over the bucket tree
                self.parts = parts
                self.part_regions = regions
                with BamReader(parts[0]) as r:
                    self.header = r.header
                return
            self.header, self._cols = load_bam_input_columns(path)
            return
        self.stream = (p.is_file()
                       and Path(str(p) + ".bai").exists()
                       and p.stat().st_size > stream_threshold_bytes)
        if self.stream:
            with BamReader(p) as r:
                self.header = r.header
        else:
            self.header, self._cols = load_bam_input_columns(path)

    @classmethod
    def from_conf(cls, conf: Config, path: str) -> "BamInputSource":
        return cls(path, conf.get("tpu.bam.stream_mb") << 20)

    def columns_for(self, shard, by_start: bool = False) -> RecordColumns:
        """Columns of mapped records overlapping a shard's intervals.

        ``by_start=True`` selects by record START instead (a partition:
        every record lands in exactly one shard) — for partitioning
        stages like printreads where overlap selection would emit
        boundary-spanning reads twice."""
        if self.parts is not None:
            # bucket folder: decode only region-intersecting parts
            picked = []
            for part, regions in zip(self.parts, self.part_regions):
                hit = any(
                    iv.contig == pr.contig
                    and iv.start <= pr.end and pr.start <= iv.end
                    for iv in shard for pr in regions)
                if hit:
                    picked.append(read_bam_columns(part)[1])
            cols = (RecordColumns.concat(picked) if picked
                    else RecordColumns.from_records([]))
            return self._filter_shard(cols, shard, by_start)
        if self.stream:
            _, cols = read_bam_region_columns(
                self.path,
                [(iv.contig, iv.start - 1, iv.end) for iv in shard])
            if not by_start:
                return cols
            f = cols.fixed
            m = np.zeros(len(cols), bool)
            for iv in shard:
                t = self.header.tid(iv.contig)
                m |= ((f[:, F_TID] == t) & (f[:, F_POS] >= iv.start - 1)
                      & (f[:, F_POS] < iv.end))
            return cols.take(np.flatnonzero(m))
        return self._filter_shard(self._cols, shard, by_start)

    def _filter_shard(self, cols: RecordColumns, shard,
                      by_start: bool) -> RecordColumns:
        f = cols.fixed
        m = np.zeros(len(cols), bool)
        for iv in shard:
            t = self.header.tid(iv.contig)
            if by_start:
                m |= ((f[:, F_TID] == t) & (f[:, F_POS] >= iv.start - 1)
                      & (f[:, F_POS] < iv.end))
            else:
                m |= ((f[:, F_TID] == t) & (f[:, F_POS] < iv.end)
                      & (f[:, F_ENDPOS] > iv.start - 1))
        m &= (f[:, F_FLAG] & FLAG_UNMAPPED) == 0
        return cols.take(np.flatnonzero(m))

    def records_for(self, shard) -> list:
        """Records overlapping a shard (list of Intervals), mapped only."""
        return self.columns_for(shard).to_records()

    @property
    def columns(self) -> RecordColumns:
        """All records as columns (loads whole file in stream mode)."""
        if self._cols is None:
            _, self._cols = read_bam_columns(self.path)
        return self._cols

    @property
    def records(self) -> list:
        """All records as objects (whole-file mode only callers)."""
        return self.columns.to_records()


def _stream_markdup(parts: list[str], output: str,
                    rg_to_lib: dict[str, str], remove_dups: bool,
                    optical_pixel_dist: int = 100):
    """Bounded-memory MARKDUP over a ``part-%06d`` bucket tree.

    Never holds the whole input as columns (the reference's streaming
    sambamba markdup with its bounded fd budget,
    SambambaWorker.cpp:59-72).  Three passes over the buckets, one
    bucket resident at a time:

    1. scan: each bucket decodes once into ~33-byte/record compact
       duplicate-scan arrays (``dup_scan_columns``) and is freed;
    2. decide: the shared decision core runs on the concatenated compact
       arrays; the record names it needs (score ties, optical keys) are
       fetched lazily per bucket;
    3. rewrite: buckets stream — in genome order — through the
       BamColumnsWriter with FLAG_DUP applied from the global mask.

    Returns (ndup, metrics, header) or None when the bucket ranges
    overlap (a foreign, non-position-bucketed tree → caller falls back
    to the in-memory path).
    """
    import numpy as np

    from ..bamops import _dup_core, dup_scan_columns
    from ..io import native_ext
    from ..io.bam import BamColumnsWriter
    from ..io.sam import FLAG_DUP

    if not native_ext.available():
        return None
    header = None
    scans = []
    bounds: list[tuple[int, int] | None] = []
    offsets = [0]
    for part in parts:
        h, cols = read_bam_columns(part)
        header = header or h
        scans.append(dup_scan_columns(cols, rg_to_lib))
        f = cols.fixed
        m = (f[:, F_FLAG] & FLAG_UNMAPPED) == 0
        if m.any():
            key = ((f[m, F_TID].astype(np.int64) << 32)
                   | f[m, F_POS].astype(np.int64))
            bounds.append((int(key.min()), int(key.max())))
        else:
            bounds.append(None)
        offsets.append(offsets[-1] + len(cols))
        del cols
    # genome order = buckets by min mapped key, all-unmapped trees last;
    # ranges must be disjoint for the concatenation to stay sorted
    order = sorted(range(len(parts)),
                   key=lambda i: (bounds[i] is None,
                                  bounds[i][0] if bounds[i] else 0))
    prev_max = None
    for i in order:
        if bounds[i] is None:
            continue
        if prev_max is not None and bounds[i][0] <= prev_max:
            log.warning("markdup: bucket ranges overlap — falling back "
                        "to the in-memory path")
            return None
        prev_max = bounds[i][1]
    cat = {k: np.concatenate([s[k] for s in scans]) for k in scans[0]}
    del scans
    offs = np.asarray(offsets, np.int64)

    def names_for(idx: np.ndarray) -> dict[int, bytes]:
        out: dict[int, bytes] = {}
        bis = np.searchsorted(offs, idx, "right") - 1
        for bi in np.unique(bis):
            _, cols = read_bam_columns(parts[int(bi)])
            blob = cols.names.tobytes()
            no = cols.name_off
            ln = cols.fixed[:, F_LNAME]
            for i in idx[bis == bi]:
                j = int(i - offs[bi])
                out[int(i)] = blob[int(no[j]):int(no[j]) + int(ln[j])]
        return out

    hit, metrics = _dup_core(
        cat["h"], cat["nk2"], cat["ekey"], cat["mapped"], cat["qsum"],
        names_for, optical_pixel_dist, return_metrics=True)
    del cat

    writer = BamColumnsWriter(output, header)
    ndup = 0
    try:
        for bi in order:
            _, cols = read_bam_columns(parts[bi])
            m = hit[offsets[bi]:offsets[bi + 1]]
            f = cols.fixed
            newly = m & ((f[:, F_FLAG] & FLAG_DUP) == 0)
            ndup += int(newly.sum())
            f[:, F_FLAG] = np.where(m, f[:, F_FLAG] | FLAG_DUP,
                                    f[:, F_FLAG])
            if remove_dups:
                cols = cols.take(np.flatnonzero(
                    (f[:, F_FLAG] & FLAG_DUP) == 0))
            writer.write_columns(cols, order=cols.coordinate_order())
    finally:
        writer.close()
    return ndup, metrics, header


def run_markdup(conf: Config, input_path: str, output: str,
                force: bool = False,
                extra_opts: list[str] | None = None) -> str:
    from ..utils.extraopts import ExtraOpts
    xo = ExtraOpts(extra_opts)
    # sambamba markdup surface (SambambaWorker.cpp:74-91): -r removes
    # duplicate records instead of flagging them
    remove_dups = xo.has("-r", "--remove-duplicates")
    xo.warn_unused("markdup")
    output = check_output(output, force)

    p = Path(input_path)
    if p.is_dir():
        parts = get_input_list(p, r"part-\d+.*\.bam")
        total = sum(Path(x).stat().st_size for x in parts)
        if parts and total > (conf.get("tpu.bam.stream_mb") << 20):
            from ..io.bam import BamReader
            with BamReader(parts[0]) as r:
                rg_to_lib = {rg.get("ID", ""): rg.get("LB", "")
                             for rg in r.header.read_groups}
            res = _stream_markdup(parts, output, rg_to_lib, remove_dups)
            if res is not None:
                ndup, metrics, _ = res
                log.info(
                    "markdup (streamed, %d buckets): %d duplicates "
                    "(%d optical), %d pairs / %d unpaired examined, "
                    "est. library size %s → %s%s",
                    len(parts), ndup, metrics.optical_duplicates,
                    metrics.pairs_examined, metrics.unpaired_examined,
                    metrics.estimated_library_size, output, rss_suffix())
                return output

    header, cols = load_bam_input_columns(input_path)
    cols, ndup, metrics = mark_duplicates_columns(
        cols, return_metrics=True,
        rg_to_lib={rg.get("ID", ""): rg.get("LB", "")
                   for rg in header.read_groups})
    if remove_dups:
        import numpy as np
        from ..io.columns import F_FLAG
        from ..io.sam import FLAG_DUP
        cols = cols.take(np.flatnonzero(
            (cols.fixed[:, F_FLAG] & FLAG_DUP) == 0))
    write_bam_columns(output, header, cols, order=cols.coordinate_order())
    log.info(
        "markdup: %d records, %d duplicates (%d optical), "
        "%d pairs / %d unpaired examined, est. library size %s → %s%s",
        len(cols), ndup, metrics.optical_duplicates,
        metrics.pairs_examined, metrics.unpaired_examined,
        metrics.estimated_library_size, output, rss_suffix())
    return output
