"""--extra-options semantics (port of the reference's
extra-opts-check.bats:5-35 scenarios) + Mutect2 resource inputs
(panel-of-normals / germline resource / contamination / dbsnp)."""
import numpy as np
import pytest

from falcon_genome_tpu.io.vcf import VcfRecord, read_vcf
from falcon_genome_tpu.models.mutect2 import (
    SomaticResources, annotate_resources, filter_mutect_calls,
    read_contamination_table)
from falcon_genome_tpu.utils.extraopts import ExtraOpts, parse_extra_options


class TestParseExtraOptions:
    """Exact Worker.h:38-58 parse semantics."""

    def test_key_value(self):
        m = parse_extra_options(["--emitRefConfidence NONE"])
        assert m == {"--emitRefConfidence": ["NONE"]}

    def test_short_alias(self):
        m = parse_extra_options(["-ERC NONE"])
        assert m == {"-ERC": ["NONE"]}

    def test_multiple_options_one_string(self):
        m = parse_extra_options(
            ["--emitRefConfidence NONE --variant_index_type DYNAMIC_SEEK "
             "--variant_index_parameter 100000"])
        assert m == {"--emitRefConfidence": ["NONE"],
                     "--variant_index_type": ["DYNAMIC_SEEK"],
                     "--variant_index_parameter": ["100000"]}

    def test_boolean_option(self):
        m = parse_extra_options(["--debug"])
        assert m == {"--debug": [""]}

    def test_boolean_mixed_positions(self):
        for s in ("--debug --emitRefConfidence NONE --vip 100000",
                  "--emitRefConfidence NONE --debug --vip 100000",
                  "--emitRefConfidence NONE --vip 100000 --debug"):
            m = parse_extra_options([s])
            assert m == {"--debug": [""],
                         "--emitRefConfidence": ["NONE"],
                         "--vip": ["100000"]}, s

    def test_multiple_extra_options_flags(self):
        m = parse_extra_options(["--emitRefConfidence NONE --debug",
                                 "--vip 100000 --vit DYNAMIC_SEEK"])
        assert m == {"--emitRefConfidence": ["NONE"], "--debug": [""],
                     "--vip": ["100000"], "--vit": ["DYNAMIC_SEEK"]}

    def test_nct_dropped(self):
        m = parse_extra_options(["-nct 8 --debug"])
        assert m == {"--debug": [""]}

    def test_repeat_key_appends_last_wins(self):
        m = parse_extra_options(["-K a.vcf -K b.vcf"])
        assert m == {"-K": ["a.vcf", "b.vcf"]}
        assert ExtraOpts(m).get("-K") == "b.vcf"
        assert ExtraOpts(m).get_all("-K") == ["a.vcf", "b.vcf"]


class TestExtraOptsStageOverride:
    def test_htc_erc_none_overrides_gvcf(self, tmp_path, rng):
        """-ERC NONE must switch htc out of gVCF mode (override-wins)."""
        from falcon_genome_tpu.stages.calling import _htc_params_with_extras
        p = _htc_params_with_extras(True, "S", ExtraOpts(["-ERC NONE"]))
        assert p.emit_gvcf is False
        p = _htc_params_with_extras(
            False, "S", ExtraOpts(["--emitRefConfidence GVCF"]))
        assert p.emit_gvcf is True

    def test_htc_thresholds(self):
        from falcon_genome_tpu.stages.calling import _htc_params_with_extras
        p = _htc_params_with_extras(
            True, "S",
            ExtraOpts(["-stand_call_conf 30 -mmq 20 --gcpHMM 12"]))
        assert p.min_call_qual == 30.0
        assert p.min_mapq == 20
        assert p.gcp == 12

    def test_defaults_without_extras(self):
        from falcon_genome_tpu.models.haplotypecaller import HTCParams
        from falcon_genome_tpu.stages.calling import _htc_params_with_extras
        p = _htc_params_with_extras(True, "S", ExtraOpts(None))
        d = HTCParams()
        assert (p.min_call_qual, p.min_mapq, p.gcp) == (
            d.min_call_qual, d.min_mapq, d.gcp)

    def test_cli_htc_extra_options_reach_stage(self, tmp_path, monkeypatch):
        """CLI --extra-options flow through to the stage call."""
        from falcon_genome_tpu import cli, stages
        seen = {}

        def fake(conf, ref, inp, out, **kw):
            seen.update(kw)
            return out
        monkeypatch.setattr(stages, "run_htc", fake)
        ref = tmp_path / "r.fa"
        ref.write_text(">c\nACGT\n")
        rc = cli.main(["htc", "-r", str(ref), "-i", "x.bam",
                       "-o", str(tmp_path / "o.vcf"),
                       "--extra-options", "-ERC NONE -stand_call_conf 30"])
        assert rc == 0
        assert seen["extra_opts"] == ["-ERC NONE -stand_call_conf 30"]


class TestGatkReport:
    def test_roundtrip(self, rng, tmp_path):
        from falcon_genome_tpu.bqsr import (
            RecalModel, baserecal_table, read_gatk_report,
            write_gatk_report)
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.sam import SamRecord, cigar_from_str
        ref = rng.integers(0, 4, 800).astype(np.uint8)
        recs = []
        for i in range(120):
            pos = int(rng.integers(0, 740))
            seq = ref[pos:pos + 60].copy()
            err = rng.random(60) < 0.03
            seq = np.where(err, (seq + 1) % 4, seq)
            q = (rng.integers(10, 40, 60) + 33).astype(np.uint8)
            r = SamRecord(f"r{i}", 0, 0, pos, 60, cigar_from_str("60M"),
                          seq=decode_seq(seq),
                          qual=q.tobytes().decode("latin1"))
            r.set_tag("RG", "Z", "rgA")
            recs.append(r)
        table = baserecal_table(recs, {0: ref}, ["rgA"])
        path = str(tmp_path / "recal.table")
        write_gatk_report(table, path)
        txt = open(path).read()
        assert txt.startswith("#:GATKReport.v1.1")
        for t in ("RecalTable0", "RecalTable1", "RecalTable2"):
            assert t in txt
        got = read_gatk_report(path)
        assert got.read_groups == ["rgA"]
        np.testing.assert_allclose(got.qual_obs, table.qual_obs)
        np.testing.assert_allclose(got.qual_err, table.qual_err, atol=0.01)
        np.testing.assert_allclose(got.ctx_obs, table.ctx_obs)
        np.testing.assert_allclose(got.cycle_obs, table.cycle_obs)
        # the refit model from the report matches the original
        m1 = RecalModel.fit(table)
        m2 = RecalModel.fit(got)
        np.testing.assert_allclose(m2.global_delta, m1.global_delta,
                                   atol=0.01)

    def test_recaltable_load_autodetects(self, tmp_path):
        from falcon_genome_tpu.bqsr import (
            RecalTable, write_gatk_report)
        t = RecalTable.zeros(["rg0"])
        t.qual_obs[0, 30] = 100
        t.qual_err[0, 30] = 1
        path = str(tmp_path / "r.table")
        write_gatk_report(t, path)
        got = RecalTable.load(path)
        assert got.qual_obs[0, 30] == 100


class TestCheckVcfIndex:
    def test_missing_index_raises(self, tmp_path):
        from falcon_genome_tpu.utils.common import check_vcf_index
        from falcon_genome_tpu.utils.errors import FileNotFound, SilentExit
        v = tmp_path / "k.vcf"
        v.write_text("##fileformat=VCFv4.2\n")
        with pytest.raises(FileNotFound):
            check_vcf_index(str(v), strict=True)
        # lenient mode only warns
        check_vcf_index(str(v), strict=False)
        with pytest.raises(SilentExit):
            check_vcf_index(str(tmp_path / "k.bcf"))

    def test_stale_index_touched(self, tmp_path):
        import os
        from falcon_genome_tpu.utils.common import check_vcf_index
        v = tmp_path / "k.vcf"
        idx = tmp_path / "k.vcf.idx"
        idx.write_text("")
        v.write_text("##fileformat=VCFv4.2\n")
        past = 1_000_000_000
        os.utime(idx, (past, past))
        os.utime(v, (past + 100, past + 100))
        check_vcf_index(str(v))
        assert os.path.getmtime(idx) >= os.path.getmtime(v)


def _vcf(tmp_path, name, rows, contigs=(("chr1", 10000),)):
    from falcon_genome_tpu.io.vcf import VcfHeader, write_vcf
    header = VcfHeader(contigs=list(contigs), samples=[], meta=[
        '##INFO=<ID=AF,Number=A,Type=Float,Description="pop AF">'])
    recs = [VcfRecord(contig=c, pos=p, ref=r, alts=[a], id=i,
                      info=info or {})
            for (c, p, r, a, i, info) in rows]
    path = str(tmp_path / name)
    write_vcf(path, header, recs)
    return path


class TestSomaticResources:
    def test_pon_and_popaf_annotation(self, tmp_path):
        pon = _vcf(tmp_path, "pon.vcf",
                   [("chr1", 101, "A", "T", ".", None)])
        germ = _vcf(tmp_path, "germ.vcf",
                    [("chr1", 201, "G", "C", "rs1", {"AF": 0.25})])
        res = SomaticResources.load(pon=pon, germline=germ)
        recs = [
            VcfRecord(contig="chr1", pos=101, ref="A", alts=["T"],
                      info={"TLOD": 20.0}),
            VcfRecord(contig="chr1", pos=201, ref="G", alts=["C"],
                      info={"TLOD": 20.0}),
            VcfRecord(contig="chr1", pos=301, ref="T", alts=["A"],
                      info={"TLOD": 20.0}),
        ]
        annotate_resources(recs, "chr1", 0, 10000, res)
        assert recs[0].info.get("PON") is True
        assert "PON" not in recs[1].info
        assert recs[1].info["POPAF"] == pytest.approx(0.6, abs=0.01)
        # absent from the resource → default tiny AF → POPAF 6
        assert recs[2].info["POPAF"] == pytest.approx(6.0, abs=0.01)

    def test_filters_consume_resources(self):
        recs = [
            VcfRecord(contig="chr1", pos=1, ref="A", alts=["T"],
                      info={"TLOD": 20.0, "PON": True},
                      samples=[{"AD": [10, 8], "AF": 0.4}]),
            VcfRecord(contig="chr1", pos=2, ref="A", alts=["T"],
                      info={"TLOD": 20.0, "POPAF": 0.6},
                      samples=[{"AD": [10, 8], "AF": 0.4}]),
            VcfRecord(contig="chr1", pos=3, ref="A", alts=["T"],
                      info={"TLOD": 20.0},
                      samples=[{"AD": [50, 2], "AF": 0.02}]),
            VcfRecord(contig="chr1", pos=4, ref="A", alts=["T"],
                      info={"TLOD": 20.0, "POPAF": 6.0},
                      samples=[{"AD": [10, 8], "AF": 0.4}]),
        ]
        filter_mutect_calls(recs, contamination=0.05)
        assert "panel_of_normals" in recs[0].filter
        assert "germline" in recs[1].filter
        assert "contamination" in recs[2].filter
        assert recs[3].filter == "PASS"

    def test_dbsnp_id_annotation(self, tmp_path):
        db = _vcf(tmp_path, "dbsnp.vcf",
                  [("chr1", 55, "C", "G", "rs42", None)])
        res = SomaticResources.load(dbsnp=[db])
        recs = [VcfRecord(contig="chr1", pos=55, ref="C", alts=["G"],
                          info={})]
        annotate_resources(recs, "chr1", 0, 1000, res)
        assert recs[0].id == "rs42"
        assert recs[0].info.get("DB") is True

    def test_contamination_table(self, tmp_path):
        t = tmp_path / "cont.table"
        t.write_text("sample\tcontamination\terror\nS1\t0.037\t0.001\n")
        assert read_contamination_table(str(t)) == pytest.approx(0.037)

    def test_mutect2_cli_with_pon(self, tmp_path, rng):
        """e2e: a PoN covering one somatic site filters it."""
        from falcon_genome_tpu.config import Config, Machine
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.fasta import write_fasta
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.sam import SamHeader, SamRecord, \
            cigar_from_str
        from falcon_genome_tpu import stages

        ref = rng.integers(0, 4, 3000).astype(np.uint8)
        ref_path = tmp_path / "ref.fa"
        write_fasta(ref_path, {"chr1": decode_seq(ref)})
        tum = ref.copy()
        tum[1000] = (tum[1000] + 1) % 4
        tum[2000] = (tum[2000] + 1) % 4

        def reads(hap, frac, name):
            out = []
            for i in range(600):
                pos = int(rng.integers(0, len(hap) - 100))
                src = hap if (i % 100) < frac * 100 else ref
                # alternate strand/mate orientation so the orientation
                # (F1R2/F2R1 skew) filter sees balanced evidence
                flag = (0x10 if i % 2 else 0) | (0x80 if i % 4 >= 2 else 0)
                out.append(SamRecord(
                    f"{name}{i}", flag, 0, pos, 60, cigar_from_str("100M"),
                    seq=decode_seq(src[pos:pos + 100]), qual="I" * 100))
            out.sort(key=lambda r: r.pos)
            return out
        header = SamHeader(contigs=[("chr1", 3000)])
        t_bam = tmp_path / "t.bam"
        n_bam = tmp_path / "n.bam"
        write_bam(t_bam, header, reads(tum, 0.5, "t"))
        write_bam(n_bam, header, reads(ref, 0.0, "n"))
        pon = _vcf(tmp_path, "pon.vcf",
                   [("chr1", 1001, decode_seq(ref[1000:1001]),
                     decode_seq(tum[1000:1001]), ".", None)])
        conf = Config(machine=Machine(8, 16), environ={},
                      load_files=False)
        conf.set("gatk.ncontigs", 2)
        out = tmp_path / "somatic.vcf"
        stages.run_mutect2(conf, str(ref_path), str(t_bam), str(out),
                           normal_path=str(n_bam),
                           panels_of_normals=pon, force=True)
        _, recs = read_vcf(str(out))
        by_pos = {r.pos: r for r in recs}
        assert 1001 in by_pos and 2001 in by_pos
        assert "panel_of_normals" in by_pos[1001].filter
        assert by_pos[2001].filter == "PASS"
