"""I/O layer tests: codecs roundtrip + interval splitter semantics
(modeled on the splitter behavior pinned by the reference, config.cpp:393-774).
"""
import gzip

import numpy as np
import pytest

from falcon_genome_tpu.io import dna
from falcon_genome_tpu.io.bam import read_bam, write_bam
from falcon_genome_tpu.io.bgzf import (
    BgzfReader, BgzfWriter, bgzf_compress_file, is_bgzf)
from falcon_genome_tpu.io.fasta import (
    FastaFile, ReferenceDict, ContigInfo, write_fasta)
from falcon_genome_tpu.io.fastq import FastqReader, read_fastq, write_fastq
from falcon_genome_tpu.io.intervals import (
    Interval, intersect_intervals, merge_intervals, parse_interval,
    read_interval_list, round_up, split_equal_bp, split_interval_file,
    split_ref_round_up, total_bp, write_interval_list)
from falcon_genome_tpu.io.sam import (
    FLAG_REVERSE, SamHeader, SamRecord, cigar_from_str, cigar_query_len,
    cigar_ref_len, cigar_to_str, read_sam, write_sam)
from falcon_genome_tpu.io.vcf import (
    VcfHeader, VcfRecord, concat_vcfs, read_vcf, sort_vcf, write_vcf)


class TestDna:
    def test_roundtrip(self):
        s = "ACGTNacgtnRYK"
        codes = dna.encode_seq(s)
        assert dna.decode_seq(codes) == "ACGTNACGTNNNN"

    def test_revcomp(self):
        codes = dna.encode_seq("AACGT")
        assert dna.decode_seq(dna.revcomp_codes(codes)) == "ACGTT"


class TestFasta:
    def test_scan_and_fetch(self, tmp_path):
        ref = tmp_path / "ref.fa"
        write_fasta(ref, {"chr1": "ACGT" * 30, "chr2": "TTTTGGGGCCCCAAAA"},
                    line_width=10)
        fa = FastaFile(ref)
        assert fa.dict.names() == ["chr1", "chr2"]
        assert fa.dict.by_name["chr1"].length == 120
        assert dna.decode_seq(fa.fetch_codes("chr2", 0, 8)) == "TTTTGGGG"
        assert dna.decode_seq(fa.fetch_codes("chr1", 117, 120)) == "CGT"
        # sidecars were generated
        assert (tmp_path / "ref.fa.fai").exists()
        assert (tmp_path / "ref.dict").exists()
        # re-open uses the fai
        fa2 = FastaFile(ref)
        assert fa2.dict.by_name["chr2"].length == 16

    def test_dict_parse(self, tmp_path):
        d = tmp_path / "r.dict"
        d.write_text("@HD\tVN:1.6\n@SQ\tSN:chrA\tLN:1000\n@SQ\tSN:chrB\tLN:500\n")
        rd = ReferenceDict.from_dict_file(d)
        assert rd.names() == ["chrA", "chrB"]
        assert rd.total_length() == 1500


class TestFastq:
    def test_roundtrip_batches(self, tmp_path):
        names = [f"r{i}" for i in range(5)]
        seqs = ["ACGTACGT", "TTTT", "GGGGGGGGGG", "AC", "GTCA"]
        quals = ["IIIIIIII", "JJJJ", "KKKKKKKKKK", "!!", "####"]
        fq = tmp_path / "in.fastq.gz"
        write_fastq(fq, names, seqs, quals)
        batches = list(FastqReader(fq, batch_size=2))
        assert [len(b[0]) for b in batches] == [2, 2, 1]
        b0 = batches[0][0]
        assert b0.names == ["r0", "r1"]
        assert dna.decode_seq(b0.codes[0, :8]) == "ACGTACGT"
        assert b0.lengths.tolist() == [8, 4]
        assert b0.quals[0, 0] == ord("I") - 33

    def test_paired_mismatch_raises(self, tmp_path):
        f1 = tmp_path / "1.fastq"
        f2 = tmp_path / "2.fastq"
        write_fastq(f1, ["a", "b"], ["AC", "GT"], ["II", "II"])
        write_fastq(f2, ["a"], ["AC"], ["II"])
        with pytest.raises(Exception):
            list(FastqReader(f1, f2, batch_size=10))


def _rdict(*lengths, prefix="chr"):
    return ReferenceDict(
        [ContigInfo(f"{prefix}{i+1}", L) for i, L in enumerate(lengths)])


class TestIntervalSplitters:
    def test_equal_bp_simple(self):
        rd = _rdict(100, 100)
        shards = split_equal_bp(rd, 4)
        assert len(shards) == 4
        # each shard covers 50bp, chromosomes split at their midpoint
        assert shards[0] == [Interval("chr1", 1, 50)]
        assert shards[1] == [Interval("chr1", 51, 100)]
        assert shards[2] == [Interval("chr2", 1, 50)]
        assert shards[3] == [Interval("chr2", 51, 100)]

    def test_equal_bp_mid_chromosome_split(self):
        rd = _rdict(130, 70)
        shards = split_equal_bp(rd, 2)  # cap = 100
        assert shards[0] == [Interval("chr1", 1, 100)]
        assert shards[1] == [Interval("chr1", 101, 130), Interval("chr2", 1, 70)]

    def test_equal_bp_full_coverage_no_overlap(self):
        rd = _rdict(317, 250, 97, 1000)
        shards = split_equal_bp(rd, 7)
        assert sum(total_bp(s) for s in shards) == rd.total_length()
        seen = set()
        for s in shards:
            for iv in s:
                for p in range(iv.start, iv.end + 1):
                    key = (iv.contig, p)
                    assert key not in seen
                    seen.add(key)

    def test_equal_bp_skips_pseudo_chromosomes(self):
        rd = ReferenceDict([ContigInfo(f"c{i}", 10) for i in range(30)])
        shards = split_equal_bp(rd, 5, skip_pseudo_chr=True)
        covered = {iv.contig for s in shards for iv in s}
        assert covered == {f"c{i}" for i in range(25)}
        shards_all = split_equal_bp(rd, 5, skip_pseudo_chr=False)
        assert {iv.contig for s in shards_all for iv in s} == \
            {f"c{i}" for i in range(30)}

    def test_round_up(self):
        # semantics pinned by reference roundUp (config.cpp:514-522)
        assert round_up(10, 4) == 12
        assert round_up(12, 4) == 12
        assert round_up(0, 4) == 0
        assert round_up(7, 0) == 7

    def test_split_ref_round_up_covers_genome(self):
        rd = _rdict(1000, 400, 250)
        shards = split_ref_round_up(rd, 4)
        assert sum(total_bp(s) for s in shards) == rd.total_length()
        for s in shards:
            for iv in s:
                assert iv.end <= rd.by_name[iv.contig].length

    def test_split_interval_file(self, tmp_path):
        path = tmp_path / "genes.list"
        ivs = [Interval("chr1", i * 10 + 1, i * 10 + 10) for i in range(10)]
        write_interval_list(path, ivs)
        shards = split_interval_file(path, 3)
        assert len(shards) == 3
        flat = [iv for s in shards for iv in s]
        assert flat == ivs


class TestIntervalOps:
    def test_parse(self):
        assert parse_interval("chr1:5-10") == Interval("chr1", 5, 10)
        assert parse_interval("chrX:7") == Interval("chrX", 7, 7)

    def test_intersection(self):
        a = [Interval("chr1", 1, 100), Interval("chr2", 50, 60)]
        b = [Interval("chr1", 90, 150), Interval("chr2", 1, 54)]
        got = intersect_intervals(a, b)
        assert got == [Interval("chr1", 90, 100), Interval("chr2", 50, 54)]

    def test_merge(self):
        ivs = [Interval("chr1", 10, 20), Interval("chr1", 15, 30),
               Interval("chr1", 31, 40), Interval("chr2", 1, 5)]
        assert merge_intervals(ivs) == [
            Interval("chr1", 10, 40), Interval("chr2", 1, 5)]

    def test_bed_roundtrip(self, tmp_path):
        ivs = [Interval("chr1", 11, 20)]
        bed = tmp_path / "x.bed"
        write_interval_list(bed, ivs)
        assert bed.read_text() == "chr1\t10\t20\n"
        assert read_interval_list(bed) == ivs


class TestCigar:
    def test_roundtrip(self):
        c = cigar_from_str("5S90M2I3D10M")
        assert cigar_to_str(c) == "5S90M2I3D10M"
        assert cigar_query_len(c) == 107
        assert cigar_ref_len(c) == 103


class TestSamBam:
    def _sample(self):
        header = SamHeader(contigs=[("chr1", 1000), ("chr2", 500)],
                           read_groups=[{"ID": "rg1", "SM": "s1", "PL": "illumina"}],
                           sort_order="coordinate")
        recs = [
            SamRecord("q1", 99, 0, 10, 60, cigar_from_str("8M"), 0, 50, 48,
                      "ACGTACGT", "IIIIIIII",
                      {"NM": ("i", 0), "RG": ("Z", "rg1")}),
            SamRecord("q2", 147 | FLAG_REVERSE, 1, 3, 13,
                      cigar_from_str("4M"), 1, 1, -6, "GGCC", "JJJJ", {}),
            SamRecord("unmapped", 4),
        ]
        return header, recs

    def test_sam_roundtrip(self, tmp_path):
        header, recs = self._sample()
        p = tmp_path / "x.sam"
        write_sam(str(p), header, recs)
        h2, r2 = read_sam(str(p))
        assert h2.contigs == header.contigs
        assert len(r2) == 3
        assert r2[0].qname == "q1" and r2[0].pos == 10
        assert r2[0].get_tag("NM") == 0
        assert cigar_to_str(r2[1].cigar) == "4M"

    def test_bam_roundtrip(self, tmp_path):
        header, recs = self._sample()
        p = tmp_path / "x.bam"
        write_bam(p, header, recs)
        h2, r2 = read_bam(p)
        assert h2.contigs == header.contigs
        assert [r.qname for r in r2] == ["q1", "q2", "unmapped"]
        assert r2[0].seq == "ACGTACGT"
        assert r2[0].qual == "IIIIIIII"
        assert r2[0].get_tag("RG") == "rg1"
        assert r2[1].flag == 147 | FLAG_REVERSE
        assert r2[2].tid == -1 and r2[2].seq == "*"

    def test_bam_tag_types(self, tmp_path):
        header = SamHeader(contigs=[("c", 100)])
        rec = SamRecord("q", 0, 0, 0, 60, cigar_from_str("4M"), seq="ACGT",
                        qual="IIII")
        rec.tags = {"XA": ("A", "c"), "XI": ("i", 70000), "XF": ("f", 1.5),
                    "XZ": ("Z", "hello"), "XB": ("B", ("S", [1, 2, 65535]))}
        p = tmp_path / "t.bam"
        write_bam(p, header, [rec])
        _, (r2,) = read_bam(p)
        assert r2.get_tag("XA") == "c"
        assert r2.get_tag("XI") == 70000
        assert r2.get_tag("XF") == pytest.approx(1.5)
        assert r2.get_tag("XZ") == "hello"
        assert r2.get_tag("XB") == ("S", [1, 2, 65535])


class TestBgzf:
    def test_roundtrip_and_gzip_compat(self, tmp_path):
        p = tmp_path / "x.bgzf"
        payload = b"hello bgzf " * 20000  # spans multiple blocks
        with BgzfWriter(p) as w:
            w.write(payload)
        with BgzfReader(p) as r:
            assert r.read() == payload
        with gzip.open(p, "rb") as g:  # stock gzip must read it too
            assert g.read() == payload
        assert is_bgzf(p)

    def test_compress_file(self, tmp_path):
        src = tmp_path / "a.txt"
        src.write_text("line\n" * 1000)
        out = bgzf_compress_file(src)
        with gzip.open(out, "rt") as f:
            assert f.read() == "line\n" * 1000


class TestVcf:
    def _sample(self):
        header = VcfHeader(contigs=[("chr1", 1000), ("chr2", 500)],
                           samples=["s1"])
        recs = [
            VcfRecord("chr1", 100, "A", ["G"], qual=50.0, filter="PASS",
                      info={"DP": 30}, fmt=["GT", "DP"],
                      samples=[{"GT": "0/1", "DP": 30}]),
            VcfRecord("chr2", 5, "AT", ["A"], qual=99.0, filter="PASS",
                      info={"DP": 12}, fmt=["GT"], samples=[{"GT": "1/1"}]),
        ]
        return header, recs

    @pytest.mark.parametrize("name", ["x.vcf", "x.vcf.gz"])
    def test_roundtrip(self, tmp_path, name):
        header, recs = self._sample()
        p = tmp_path / name
        write_vcf(p, header, recs)
        h2, r2 = read_vcf(p)
        assert h2.contigs == header.contigs
        assert h2.samples == ["s1"]
        assert r2[0].contig == "chr1" and r2[0].pos == 100
        assert r2[0].alts == ["G"]
        assert r2[0].samples[0]["GT"] == "0/1"
        assert r2[1].ref == "AT"

    def test_concat_and_sort(self, tmp_path):
        header, recs = self._sample()
        p1 = tmp_path / "a.vcf"
        p2 = tmp_path / "b.vcf"
        write_vcf(p1, header, [recs[1]])
        write_vcf(p2, header, [recs[0]])
        out = concat_vcfs([p1, p2], tmp_path / "out.vcf", sort=True)
        _, r = read_vcf(out)
        assert [(x.contig, x.pos) for x in r] == [("chr1", 100), ("chr2", 5)]

    def test_gvcf_block(self):
        rec = VcfRecord("chr1", 10, "A", ["<NON_REF>"], info={"END": 50})
        assert rec.is_gvcf_block


class TestNativeFastqReader:
    def test_native_matches_python(self, tmp_path):
        import numpy as np
        from falcon_genome_tpu.io import native_ext
        from falcon_genome_tpu.io.fastq import FastqReader
        if native_ext.load() is None:
            import pytest
            pytest.skip("native ext unavailable")
        rng = np.random.default_rng(3)
        fq1 = tmp_path / "a_1.fastq"
        fq2 = tmp_path / "a_2.fastq"
        bases = "ACGTN"
        with open(fq1, "w") as f1, open(fq2, "w") as f2:
            for i in range(533):           # not a multiple of batch size
                L = int(rng.integers(30, 160))
                s = "".join(bases[int(b)] for b in rng.integers(0, 5, L))
                q = "".join(chr(33 + int(x))
                            for x in rng.integers(0, 60, L))
                f1.write(f"@r{i} comment text\n{s}\n+\n{q}\n")
                L2 = int(rng.integers(30, 160))
                s2 = "".join(bases[int(b)]
                             for b in rng.integers(0, 5, L2))
                q2 = "".join(chr(33 + int(x))
                             for x in rng.integers(0, 60, L2))
                tail = "\n" if i < 532 else ""   # last record unterminated
                f2.write(f"@r{i}\n{s2}\n+\n{q2}{tail}")

        def collect(reader):
            out = []
            for b1, b2 in reader:
                out.append((b1, b2))
            return out

        nat = collect(FastqReader(fq1, fq2, batch_size=128))
        orig = native_ext.available
        try:
            native_ext.available = lambda: False
            ref = collect(FastqReader(fq1, fq2, batch_size=128))
        finally:
            native_ext.available = orig
        assert len(nat) == len(ref)
        for (n1, n2), (r1, r2) in zip(nat, ref):
            for a, b in ((n1, r1), (n2, r2)):
                assert a.names == b.names
                np.testing.assert_array_equal(a.lengths, b.lengths)
                np.testing.assert_array_equal(a.codes, b.codes)
                np.testing.assert_array_equal(a.quals, b.quals)
