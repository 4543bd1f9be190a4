"""Fused germline pipeline + indel realignment stage e2e tests."""
from pathlib import Path

import numpy as np
import pytest

from falcon_genome_tpu import stages
from falcon_genome_tpu.config import Config, Machine
from falcon_genome_tpu.io.bam import read_bam, write_bam
from falcon_genome_tpu.io.dna import decode_seq, revcomp_codes
from falcon_genome_tpu.io.fasta import write_fasta
from falcon_genome_tpu.io.fastq import write_fastq
from falcon_genome_tpu.io.sam import SamHeader, SamRecord, cigar_from_str, \
    cigar_to_str
from falcon_genome_tpu.io.vcf import read_vcf


@pytest.fixture
def conf():
    c = Config(machine=Machine(8, 16), environ={}, load_files=False)
    c.set("gatk.ncontigs", 2)
    return c


class TestGermline:
    def test_fastq_to_vcf(self, conf, tmp_path):
        rng = np.random.default_rng(5)
        chrom = rng.integers(0, 4, 3000).astype(np.uint8)
        ref = tmp_path / "ref.fa"
        write_fasta(ref, {"chr1": decode_seq(chrom)})
        alt = chrom.copy()
        alt[1500] = (alt[1500] + 1) % 4

        read_len, frag = 100, 240
        names, s1, q1, s2, q2 = [], [], [], [], []
        for i, start in enumerate(range(0, 3000 - frag, 8)):
            hap = alt if i % 2 else chrom
            names.append(f"f{start}")
            s1.append(decode_seq(hap[start:start + read_len]))
            q1.append("I" * read_len)
            s2.append(decode_seq(
                revcomp_codes(hap[start + frag - read_len:start + frag])))
            q2.append("I" * read_len)
        fq1 = tmp_path / "r_1.fastq"
        fq2 = tmp_path / "r_2.fastq"
        write_fastq(fq1, names, s1, q1)
        write_fastq(fq2, names, s2, q2)

        out = tmp_path / "germ.vcf.gz"
        stages.run_germline(conf, str(ref), str(out), fastq1=str(fq1),
                            fastq2=str(fq2), sample_id="g1",
                            produce_vcf=True, force=True)
        _, recs = read_vcf(str(out))
        variants = [r for r in recs if not r.is_gvcf_block]
        assert any(r.pos == 1501 and r.samples[0]["GT"] == "0/1"
                   for r in variants)
        # tabix index produced for the .gz output
        assert Path(str(out) + ".tbi").exists()


class TestIndelStage:
    def test_misaligned_read_rewritten(self, conf, tmp_path):
        rng = np.random.default_rng(9)
        chrom = rng.integers(0, 4, 2000).astype(np.uint8)
        ref = tmp_path / "ref.fa"
        write_fasta(ref, {"chr1": decode_seq(chrom)})

        header = SamHeader(contigs=[("chr1", 2000)])
        # reads holding a 4bp deletion but aligned with sloppy
        # mismatch-ridden full-M CIGARs (what realignment should fix)
        recs = []
        for i, start in enumerate(range(950, 1000, 5)):
            seq = np.concatenate(
                [chrom[start:start + 40], chrom[start + 44:start + 84]])
            recs.append(SamRecord(
                f"r{i}", 0, 0, start, 60, cigar_from_str("80M"),
                seq=decode_seq(seq), qual="I" * 80))
        # plus clean anchor coverage
        for i, start in enumerate(range(900, 1100, 10)):
            recs.append(SamRecord(
                f"c{i}", 0, 0, start, 60, cigar_from_str("80M"),
                seq=decode_seq(chrom[start:start + 80]), qual="I" * 80))
        recs.sort(key=lambda r: r.pos)
        bam = tmp_path / "in.bam"
        write_bam(bam, header, recs)

        out = tmp_path / "realigned.bam"
        stages.run_indel(conf, str(ref), str(bam), str(out), force=True)
        _, out_recs = read_bam(str(out))
        fixed = [r for r in out_recs if r.qname.startswith("r")]
        assert any("D" in cigar_to_str(r.cigar) for r in fixed)
        # realigned reads carry the original-cigar OC tag
        assert any(r.get_tag("OC") for r in fixed)


class TestColumnarRealignEquivalence:
    def test_columns_match_record_path(self, tmp_path):
        from falcon_genome_tpu.io.columns import RecordColumns
        from falcon_genome_tpu.io.sam import record_to_sam_line
        from falcon_genome_tpu.ops.sw_ref import SWParams
        from falcon_genome_tpu.stages.indel import (
            _realign_columns, _realign_interval)

        rng = np.random.default_rng(5)
        chrom = rng.integers(0, 4, 4000).astype(np.uint8)
        recs = []
        k = 0
        # three indel loci with sloppily-aligned reads + clean coverage
        for locus, gap in ((800, 4), (2000, 3), (3100, 5)):
            for start in range(locus - 50, locus, 5):
                seq = np.concatenate(
                    [chrom[start:start + 40],
                     chrom[start + 40 + gap:start + 80 + gap]])
                recs.append(SamRecord(
                    f"r{k}", 0, 0, start, 60, cigar_from_str("80M"),
                    seq=decode_seq(seq), qual="I" * 80))
                k += 1
            for start in range(locus - 100, locus + 100, 10):
                recs.append(SamRecord(
                    f"c{k}", 0, 0, start, 60, cigar_from_str("80M"),
                    seq=decode_seq(chrom[start:start + 80]),
                    qual="I" * 80))
                k += 1
        recs.sort(key=lambda r: r.pos)

        # fresh object copies for the record-path reference
        ref_recs = RecordColumns.from_records(recs).to_records()
        n_ref = _realign_interval(ref_recs, chrom, 0, 4000, SWParams())

        cols = RecordColumns.from_records(recs)
        n_col = _realign_columns(cols, chrom, 0, 4000, SWParams())
        assert n_col == n_ref and n_ref > 0
        got = cols.to_records()
        for a, b in zip(ref_recs, got):
            assert (a.pos, cigar_to_str(a.cigar), a.get_tag("OC")) == \
                (b.pos, cigar_to_str(b.cigar), b.get_tag("OC")), a.qname
