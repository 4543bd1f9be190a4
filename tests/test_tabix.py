"""Tabix/.bai index tests: write, read back, region query correctness."""
import numpy as np
import pytest

from falcon_genome_tpu.io.tabix import (
    TabixIndex, query_vcf_region, reg2bin, reg2bins)
from falcon_genome_tpu.io.vcf import VcfHeader, VcfRecord, write_vcf


def make_vcf(tmp_path, n=500, contigs=(("chr1", 10_000_000),
                                        ("chr2", 5_000_000))):
    rng = np.random.default_rng(3)
    header = VcfHeader(contigs=list(contigs), samples=["s"])
    records = []
    for contig, length in contigs:
        poss = np.sort(rng.choice(length - 10, size=n, replace=False))
        for p in poss:
            records.append(VcfRecord(
                contig, int(p) + 1, "A", ["G"], qual=50.0, filter="PASS",
                fmt=["GT"], samples=[{"GT": "0/1"}]))
    path = tmp_path / "x.vcf.gz"
    write_vcf(path, header, records)
    return str(path), records


class TestBinning:
    def test_reg2bin_in_reg2bins(self, rng):
        for _ in range(200):
            beg = int(rng.integers(0, 1 << 28))
            end = beg + int(rng.integers(1, 10_000))
            assert reg2bin(beg, end) in reg2bins(beg, end)


class TestTabix:
    def test_index_written_and_parses(self, tmp_path):
        path, _ = make_vcf(tmp_path)
        idx = TabixIndex.read(path + ".tbi")
        assert idx.ref_names == ["chr1", "chr2"]
        assert idx.bins[0]  # chr1 has content

    @pytest.mark.parametrize("contig,lo,hi", [
        ("chr1", 1, 100000), ("chr1", 5_000_000, 5_100_000),
        ("chr2", 1, 5_000_000), ("chr1", 9_900_000, 10_000_000),
        ("chr2", 4_999_000, 5_000_000),
    ])
    def test_query_matches_full_scan(self, tmp_path, contig, lo, hi):
        path, records = make_vcf(tmp_path)
        got = query_vcf_region(path, contig, lo, hi)
        want = [r for r in records
                if r.contig == contig and lo <= r.pos <= hi]
        assert [(r.contig, r.pos) for r in got] == \
            [(r.contig, r.pos) for r in want]

    def test_empty_region(self, tmp_path):
        path, _ = make_vcf(tmp_path)
        # query a contig not present
        assert query_vcf_region(path, "chrX", 1, 1000) == []


class TestBai:
    def test_bai_written_for_sorted_bam(self, tmp_path):
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.sam import SamHeader, SamRecord, \
            cigar_from_str
        header = SamHeader(contigs=[("chr1", 100000)])
        recs = [SamRecord(f"r{i}", 0, 0, i * 100, 60,
                          cigar_from_str("50M"), seq="A" * 50,
                          qual="I" * 50) for i in range(100)]
        p = tmp_path / "x.bam"
        write_bam(p, header, recs)
        assert (tmp_path / "x.bam.bai").exists()
        raw = (tmp_path / "x.bam.bai").read_bytes()
        assert raw[:4] == b"BAI\x01"

    def test_no_bai_for_unsorted(self, tmp_path):
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.sam import SamHeader, SamRecord, \
            cigar_from_str
        header = SamHeader(contigs=[("chr1", 100000)])
        recs = [SamRecord("a", 0, 0, 500, 60, cigar_from_str("10M"),
                          seq="A" * 10, qual="I" * 10),
                SamRecord("b", 0, 0, 100, 60, cigar_from_str("10M"),
                          seq="A" * 10, qual="I" * 10)]
        p = tmp_path / "y.bam"
        write_bam(p, header, recs)
        assert not (tmp_path / "y.bam.bai").exists()


class TestBaiRegionRead:
    def test_region_read_matches_whole_filter(self, tmp_path, rng):
        from falcon_genome_tpu.io.bam import (
            read_bam, read_bam_region, write_bam)
        from falcon_genome_tpu.io.sam import (
            SamHeader, SamRecord, cigar_from_str)
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.stages.bamstages import BamInputSource
        from falcon_genome_tpu.io.intervals import Interval

        G = 40_000
        header = SamHeader(contigs=[("c1", G), ("c2", G)])
        recs = []
        for i in range(800):
            tid = int(rng.integers(0, 2))
            pos = int(rng.integers(0, G - 100))
            seq = decode_seq(rng.integers(0, 4, 100).astype(np.uint8))
            recs.append(SamRecord(f"r{i}", 0, tid, pos, 60,
                                  cigar_from_str("100M"), seq=seq,
                                  qual="I" * 100))
        recs.sort(key=lambda r: (r.tid, r.pos))
        path = str(tmp_path / "big.bam")
        write_bam(path, header, recs)

        regions = [("c1", 5000, 9000), ("c2", 30000, 34000)]
        _, got = read_bam_region(path, regions)
        want = [r for r in recs
                if any(r.tid == header.tid(c) and r.pos < e
                       and r.end_pos > b for c, b, e in regions)]
        assert [(r.qname, r.tid, r.pos) for r in got] == \
               [(r.qname, r.tid, r.pos) for r in want]

        # BamInputSource with threshold 0 must stream and agree with the
        # whole-file filter path
        src = BamInputSource(path, stream_threshold_bytes=0)
        assert src.stream
        shard = [Interval("c1", 5001, 9000)]   # 1-based inclusive
        got2 = src.records_for(shard)
        src_whole = BamInputSource(path, stream_threshold_bytes=1 << 60)
        assert not src_whole.stream
        want2 = src_whole.records_for(shard)
        assert [(r.qname, r.pos) for r in got2] == \
               [(r.qname, r.pos) for r in want2]
