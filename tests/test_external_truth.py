"""External-truth gates without external tools.

The reference's acceptance tier compares against real bwa/GATK outputs
(scripts/compareBAM.sh, scripts/compareVCF.sh).  This environment has no
bwa/GATK binaries and no network, so the strongest available gates are:

1. a **spec-crafted BAM fixture**: BGZF + BAM record bytes assembled
   here with nothing but ``struct``/``zlib`` straight from the SAM spec
   (fully independent of ``io/bam.py``) — our codec must decode it to
   exactly the known records, and our writer's round trip must stay
   record-equivalent;
2. the in-repo **compareBAM/compareVCF analogs**
   (``utils/compare.py``) with the reference scripts' pass rules.
"""
import struct
import zlib

import pytest

from falcon_genome_tpu.io.bam import read_bam, write_bam
from falcon_genome_tpu.io.sam import SamHeader, SamRecord, cigar_from_str
from falcon_genome_tpu.io.vcf import VcfHeader, VcfRecord, write_vcf
from falcon_genome_tpu.utils.compare import compare_bam, compare_vcf


def _bgzf_block(payload: bytes) -> bytes:
    """One BGZF block per the SAM spec §4.1 (independent of io/bgzf)."""
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    data = comp.compress(payload) + comp.flush()
    bsize = 18 + len(data) + 8
    head = struct.pack("<4BI2B2H2BH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6,
                       ord("B"), ord("C"), 2, bsize - 1)
    return head + data + struct.pack("<II", zlib.crc32(payload),
                                     len(payload))


_SEQ_NIBBLE = {c: "=ACMGRSVTWYHKDBN".index(c) for c in "=ACGTN"}


def _bam_record(qname: str, flag: int, tid: int, pos: int, mapq: int,
                cigar: list[tuple[int, int]], seq: str, qual: str,
                mtid: int = -1, mpos: int = -1, tlen: int = 0,
                tags: bytes = b"") -> bytes:
    name = qname.encode() + b"\0"
    cig = b"".join(struct.pack("<I", (n << 4) | op) for op, n in cigar)
    packed = bytearray()
    for i in range(0, len(seq), 2):
        hi = _SEQ_NIBBLE[seq[i]] << 4
        lo = _SEQ_NIBBLE[seq[i + 1]] if i + 1 < len(seq) else 0
        packed.append(hi | lo)
    q = bytes(ord(c) - 33 for c in qual)
    ref_len = sum(n for op, n in cigar if op in (0, 2, 3, 7, 8))
    bin_ = 4681 + (pos >> 14) if pos >= 0 else 4680  # any valid bin
    body = struct.pack(
        "<iiBBHHHiiii", tid, pos, len(name), mapq, bin_, len(cigar),
        flag, len(seq), mtid, mpos, tlen) + name + cig + bytes(packed) \
        + q + tags
    return struct.pack("<i", len(body)) + body


def _craft_fixture(path, records_bytes: list[bytes]) -> None:
    text = ("@HD\tVN:1.6\tSO:coordinate\n"
            "@SQ\tSN:chrT\tLN:1000\n").encode()
    header = (b"BAM\x01" + struct.pack("<i", len(text)) + text
              + struct.pack("<i", 1)
              + struct.pack("<i", 5) + b"chrT\0"
              + struct.pack("<i", 1000))
    payload = header + b"".join(records_bytes)
    eof = bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000"
                        "000000000000")
    with open(path, "wb") as f:
        f.write(_bgzf_block(payload) + eof)


class TestSpecCraftedBam:
    def test_codec_decodes_known_bytes(self, tmp_path):
        recs = [
            _bam_record("read1", 0, 0, 9, 60,
                        [(0, 8)], "ACGTACGT", "IIIIHHHH",
                        tags=b"NMC\x01"),
            _bam_record("read2", 16, 0, 49, 13,
                        [(4, 2), (0, 4), (1, 1), (0, 1)],
                        "NACGTACG", "!!IIHH++"),
            _bam_record("read3", 0x4D, -1, -1, 0, [], "ACGT", "IIII",
                        mtid=0, mpos=9),
        ]
        bam = tmp_path / "crafted.bam"
        _craft_fixture(bam, recs)
        header, got = read_bam(str(bam))
        assert header.contigs == [("chrT", 1000)]
        assert [r.qname for r in got] == ["read1", "read2", "read3"]
        r1, r2, r3 = got
        assert (r1.tid, r1.pos, r1.mapq, r1.flag) == (0, 9, 60, 0)
        assert r1.seq == "ACGTACGT" and r1.qual == "IIIIHHHH"
        assert r1.cigar == cigar_from_str("8M")
        assert r1.get_tag("NM") == 1
        assert r2.flag == 16 and r2.cigar == cigar_from_str("2S4M1I1M")
        assert r2.seq[0] == "N"
        assert r3.is_unmapped and r3.tid == -1 and r3.mtid == 0

    def test_round_trip_record_equivalent(self, tmp_path):
        recs = [
            _bam_record("read1", 0, 0, 9, 60, [(0, 8)],
                        "ACGTACGT", "IIIIHHHH", tags=b"NMC\x01"),
            _bam_record("read2", 16, 0, 49, 13,
                        [(4, 2), (0, 4), (1, 1), (0, 1)],
                        "NACGTACG", "!!IIHH++"),
        ]
        crafted = tmp_path / "crafted.bam"
        _craft_fixture(crafted, recs)
        header, got = read_bam(str(crafted))
        ours = tmp_path / "ours.bam"
        write_bam(str(ours), header, got)
        diff = compare_bam(str(crafted), str(ours), compare_tags=True)
        assert diff.equivalent, diff
        assert diff.matching == 2


class TestCompareGates:
    def test_bam_diff_detects_changes(self, tmp_path):
        header = SamHeader(contigs=[("chrT", 1000)])
        a = [SamRecord("r1", 0, 0, 5, 60, cigar_from_str("4M"),
                       seq="ACGT", qual="IIII"),
             SamRecord("r2", 0, 0, 9, 60, cigar_from_str("4M"),
                       seq="ACGT", qual="IIII")]
        b = [SamRecord("r1", 0, 0, 5, 60, cigar_from_str("4M"),
                       seq="ACGT", qual="IIII"),
             SamRecord("r2", 0, 0, 11, 60, cigar_from_str("4M"),
                       seq="ACGT", qual="IIII"),
             SamRecord("r3", 0, 0, 20, 60, cigar_from_str("4M"),
                       seq="ACGT", qual="IIII")]
        pa, pb = tmp_path / "a.bam", tmp_path / "b.bam"
        write_bam(str(pa), header, a)
        write_bam(str(pb), header, b)
        diff = compare_bam(str(pa), str(pb))
        assert not diff.equivalent
        assert (diff.matching, diff.differing, diff.only_b) == (1, 1, 1)
        assert compare_bam(str(pa), str(pa)).equivalent

    def test_vcf_concordance(self, tmp_path):
        hdr = VcfHeader(contigs=[("chrT", 1000)], samples=["S"])
        mk = lambda pos, alt, gt: VcfRecord(  # noqa: E731
            contig="chrT", pos=pos, ref="A", alts=[alt],
            fmt=["GT"], samples=[{"GT": gt}])
        a = [mk(10, "T", "0/1"), mk(20, "G", "1/1"), mk(30, "C", "0/1")]
        b = [mk(10, "T", "1|0"), mk(20, "G", "0/1"), mk(40, "C", "0/1")]
        pa, pb = tmp_path / "a.vcf", tmp_path / "b.vcf"
        write_vcf(pa, hdr, a)
        write_vcf(pb, hdr, b)
        res = compare_vcf(str(pa), str(pb))
        assert res.concordant == 1       # phased 1|0 == 0/1
        assert res.discordant_gt == 1
        assert res.only_a == 1 and res.only_b == 1
        assert not res.equivalent
        assert compare_vcf(str(pa), str(pa)).equivalent
        assert compare_vcf(str(pa), str(pa)).concordance == 1.0
