"""Streamed (out-of-core) markdup over a bucket tree must decide
identically to the in-memory columnar path.

The streamed path (stages/bamstages.py::_stream_markdup) mirrors the
reference's bounded-budget streaming sambamba markdup
(src/workers/SambambaWorker.cpp:59-72); these tests force multiple spill
partitions (tiny partition_bytes) so the h-partitioned aggregation and
the k1-partitioned decision are genuinely exercised, including
cross-bucket mate pairs, score ties (name tiebreak), and optical
duplicates (sidecar-backed name fetches).
"""
import numpy as np
import pytest

from falcon_genome_tpu.bamops import mark_duplicates_columns
from falcon_genome_tpu.io import native_ext
from falcon_genome_tpu.io.bam import read_bam_columns, write_bam_columns
from falcon_genome_tpu.io.columns import F_FLAG, RecordColumns
from falcon_genome_tpu.io.sam import (
    FLAG_DUP, FLAG_REVERSE, SamHeader, SamRecord, cigar_from_str)
from falcon_genome_tpu.stages.bamstages import _stream_markdup

pytestmark = pytest.mark.skipif(
    not native_ext.available(), reason="native ext required for streaming")


def _mk_records(rng, n_frag=600, contig_len=200_000, dup_rate=0.25):
    """Paired-end records with planted duplicates: a fraction of
    fragments are emitted 2-3× with identical coordinates (PCR dups),
    some with optical-neighbor names, plus equal-quality score ties."""
    recs = []
    L = 20
    for i in range(n_frag):
        pos = int(rng.integers(0, contig_len - 1000))
        mpos = pos + int(rng.integers(100, 400))
        copies = 1
        r = rng.random()
        if r < dup_rate:
            copies = 2 + (r < dup_rate / 4)
        x0 = y0 = 0
        for c in range(copies):
            x, y = int(rng.integers(200, 30000)), int(rng.integers(200, 30000))
            if c == 0:
                x0, y0 = x, y
            elif rng.random() < 0.5:
                # optical neighbor: within 100px of the first copy
                x, y = x0 + 5 * c, y0 + 7 * c
            name = f"M01:23:FC:1:{1 + (i % 4)}:{x}:{y}"
            # equal quals sometimes → score tie, name tiebreak
            q = "I" * L if (c == 0 or rng.random() < 0.3) else "5" * L
            recs.append(SamRecord(
                name, 0x1 | 0x40, 0, pos, 60, cigar_from_str(f"{L}M"),
                seq="A" * L, qual=q, mtid=0, mpos=mpos))
            recs.append(SamRecord(
                name, 0x1 | 0x80 | FLAG_REVERSE, 0, mpos, 60,
                cigar_from_str(f"{L}M"), seq="C" * L, qual=q,
                mtid=0, mpos=pos))
    order = np.lexsort((
        np.asarray([r.pos for r in recs]),
        np.asarray([r.tid for r in recs])))
    return [recs[i] for i in order]


@pytest.fixture(scope="module")
def bucket_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("markdup-stream")
    rng = np.random.default_rng(42)
    recs = _mk_records(rng)
    header = SamHeader(contigs=[("chr1", 200_000)],
                       read_groups=[{"ID": "rg1", "LB": "lib1"}],
                       sort_order="coordinate")
    cols = RecordColumns.from_records(recs)
    # split into position-disjoint buckets by record START (mates of one
    # pair frequently land in different buckets)
    pos = cols.fixed[:, 2]
    edges = [0, 50_000, 100_000, 150_000, 200_001]
    parts = []
    for bi in range(len(edges) - 1):
        sel = np.flatnonzero((pos >= edges[bi]) & (pos < edges[bi + 1]))
        if not len(sel):
            continue
        p = tmp / f"part-{bi:06d}.bam"
        write_bam_columns(p, header, cols.take(sel))
        parts.append(str(p))
    return {"tmp": tmp, "parts": parts, "header": header, "cols": cols}


def test_streamed_equals_in_memory(bucket_world):
    tmp = bucket_world["tmp"]
    out = tmp / "marked.bam"
    res = _stream_markdup(
        bucket_world["parts"], str(out), {"rg1": "lib1"},
        remove_dups=False, partition_bytes=1 << 12,   # force ~16 spills
        spill_dir=str(tmp))
    assert res is not None
    ndup_s, metrics_s, _ = res

    ref_cols = RecordColumns.concat(
        [read_bam_columns(p)[1] for p in bucket_world["parts"]])
    ref_cols = ref_cols.take(ref_cols.coordinate_order())
    ref_cols, ndup_m, metrics_m = mark_duplicates_columns(
        ref_cols, return_metrics=True, rg_to_lib={"rg1": "lib1"})

    _, got = read_bam_columns(out)
    got = got.take(got.coordinate_order())
    assert len(got) == len(ref_cols)
    assert ndup_s == ndup_m and ndup_s > 0
    # identical per-record flags in identical order
    assert np.array_equal(got.fixed[:, F_FLAG], ref_cols.fixed[:, F_FLAG])
    assert metrics_s.pairs_examined == metrics_m.pairs_examined
    assert metrics_s.unpaired_examined == metrics_m.unpaired_examined
    assert metrics_s.pair_duplicates == metrics_m.pair_duplicates
    assert metrics_s.unpaired_duplicates == metrics_m.unpaired_duplicates
    assert metrics_s.optical_duplicates == metrics_m.optical_duplicates
    assert (metrics_s.estimated_library_size
            == metrics_m.estimated_library_size)
    assert metrics_s.optical_duplicates > 0   # fixture plants them


def test_streamed_remove_dups(bucket_world):
    tmp = bucket_world["tmp"]
    out = tmp / "removed.bam"
    res = _stream_markdup(
        bucket_world["parts"], str(out), {"rg1": "lib1"},
        remove_dups=True, partition_bytes=1 << 12, spill_dir=str(tmp))
    assert res is not None
    ndup, _, _ = res
    _, got = read_bam_columns(out)
    total = sum(len(read_bam_columns(p)[1])
                for p in bucket_world["parts"])
    assert len(got) == total - ndup
    assert not (got.fixed[:, F_FLAG] & FLAG_DUP).any()


def test_streamed_overlap_fallback(bucket_world, tmp_path):
    """Overlapping bucket ranges → None (caller falls back in-memory)."""
    # duplicate the same part twice: identical ranges overlap
    parts = [bucket_world["parts"][0], bucket_world["parts"][0]]
    res = _stream_markdup(parts, str(tmp_path / "o.bam"),
                          {"rg1": "lib1"}, remove_dups=False,
                          spill_dir=str(tmp_path))
    assert res is None


def test_spill_dir_cleanup(bucket_world):
    """No spill litter left behind."""
    leftovers = list(bucket_world["tmp"].glob("markdup-spill-*"))
    assert leftovers == []
