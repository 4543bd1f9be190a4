"""GenotypeGVCFs-fidelity semantics of the joint merge.

The reference shells joint genotyping out to GATK (GenomicsDB import +
GenotypeGVCFs, src/workers/CombineGVCFsWorker.cpp); these tests pin the
in-repo merge to the same output contract: exact-AF QUAL, allele suffix
extension, AD/PL remapping through <NON_REF>, hom-ref reconstitution,
and AC/AF/QD annotations.
"""
import numpy as np
import pytest

from falcon_genome_tpu.io.vcf import VcfRecord
from falcon_genome_tpu.stages.vcfstages import (
    _exact_af_qual, _gt_idx, _merge_shard_sites, _sample_evidence)


def _var(contig, pos, ref, alts, gt, ad, pl, dp=30, gq=99, qual=100.0):
    return VcfRecord(
        contig=contig, pos=pos, ref=ref, alts=alts, qual=qual,
        fmt=["GT", "AD", "DP", "GQ", "PL"],
        samples=[{"GT": gt, "AD": ad, "DP": dp, "GQ": gq, "PL": pl}])


def _block(contig, pos, end, gq=50, dp=25):
    return VcfRecord(
        contig=contig, pos=pos, ref="A", alts=["<NON_REF>"],
        info={"END": end}, fmt=["GT", "DP", "GQ"],
        samples=[{"GT": "0/0", "DP": dp, "GQ": gq}])


class TestExactAFQual:
    def test_strong_het_beats_weak(self):
        strong = [[1e-9, 1.0, 1e-9]]          # het at PL 90
        weak = [[10 ** -1.0, 1.0, 10 ** -1.0]]  # het at PL 10
        qs = _exact_af_qual(strong)
        qw = _exact_af_qual(weak)
        assert qs > qw > 0

    def test_homref_panel_gives_low_qual(self):
        gls = [[1.0, 1e-5, 1e-10]] * 4        # all confidently hom-ref
        q = _exact_af_qual(gls)
        assert q < 1.0

    def test_more_carriers_raise_qual(self):
        het = [1e-6, 1.0, 1e-6]
        hr = [1.0, 1e-6, 1e-12]
        q1 = _exact_af_qual([het, hr, hr, hr])
        q2 = _exact_af_qual([het, het, het, hr])
        assert q2 > q1

    def test_uninformative_returns_none_or_low(self):
        assert _exact_af_qual([]) is None


class TestMergeSemantics:
    def test_ad_pl_remap_through_nonref(self):
        # sample 1 saw alt T, sample 2 saw alt G at the same site; each
        # sample's likelihood for the OTHER allele must come from its
        # <NON_REF> column, and its AD for it must be 0
        r1 = _var("chr1", 100, "A", ["T", "<NON_REF>"], "0/1",
                  [12, 11, 0], [40, 0, 45, 60, 50, 70])
        r2 = _var("chr1", 100, "A", ["G", "<NON_REF>"], "0/1",
                  [14, 13, 0], [38, 0, 42, 58, 48, 66])
        ev = [_sample_evidence([r1]), _sample_evidence([r2])]
        recs = _merge_shard_sites(ev, ["s1", "s2"])
        assert len(recs) == 1
        r = recs[0]
        assert r.ref == "A" and set(r.alts) == {"T", "G"}
        ti, gi = r.alts.index("T") + 1, r.alts.index("G") + 1
        s1, s2 = r.samples
        assert s1["GT"] == f"0/{ti}" and s2["GT"] == f"0/{gi}"
        # AD: allele the sample never saw = 0
        assert s1["AD"][gi] == 0 and s1["AD"][ti] == 11
        assert s2["AD"][ti] == 0 and s2["AD"][gi] == 13
        # PL: s1's (0,G) genotype reads its (0,NON_REF) likelihood (60)
        pl1 = s1["PL"]
        assert pl1[_gt_idx(0, gi)] == 60
        assert pl1[_gt_idx(0, ti)] == 0
        # normalized: min PL is 0
        assert min(pl1) == 0 and min(s2["PL"]) == 0

    def test_indel_suffix_extension(self):
        # s1: SNP A>T; s2: deletion AT>A at the same pos — merged REF "AT"
        # re-expresses the SNP alt as "TT"
        r1 = _var("chr1", 200, "A", ["T", "<NON_REF>"], "0/1",
                  [10, 9, 0], [30, 0, 35, 45, 40, 60])
        r2 = _var("chr1", 200, "AT", ["A", "<NON_REF>"], "0/1",
                  [8, 7, 0], [28, 0, 33, 44, 39, 58])
        ev = [_sample_evidence([r1]), _sample_evidence([r2])]
        recs = _merge_shard_sites(ev, ["s1", "s2"])
        r = recs[0]
        assert r.ref == "AT"
        assert set(r.alts) == {"TT", "A"}

    def test_homref_block_reconstitution(self):
        r1 = _var("chr1", 300, "C", ["G", "<NON_REF>"], "0/1",
                  [15, 14, 0], [45, 0, 50, 65, 55, 80])
        ev = [_sample_evidence([r1]),
              _sample_evidence([_block("chr1", 250, 350, gq=48, dp=22)])]
        recs = _merge_shard_sites(ev, ["s1", "s2"])
        r = recs[0]
        s2 = r.samples[1]
        assert s2["GT"] == "0/0"
        assert s2["AD"] == [22, 0]
        assert s2["PL"] == [0, 48, 96]
        assert r.info["AN"] == 4
        assert r.info["AC"] == [1]
        assert r.info["AF"] == [0.25]

    def test_qual_is_exact_af_not_sum(self):
        # per-sample QUAL of 100 each; exact-AF QUAL must NOT be 200
        r1 = _var("chr1", 400, "A", ["T", "<NON_REF>"], "0/1",
                  [10, 10, 0], [50, 0, 55, 70, 60, 90], qual=100.0)
        r2 = _var("chr1", 400, "A", ["T", "<NON_REF>"], "0/1",
                  [11, 9, 0], [48, 0, 52, 68, 58, 88], qual=100.0)
        ev = [_sample_evidence([r1]), _sample_evidence([r2])]
        recs = _merge_shard_sites(ev, ["s1", "s2"])
        r = recs[0]
        assert r.qual is not None and r.qual != pytest.approx(200.0)
        assert r.qual > 20            # two confident hets: strong site
        assert "QD" in r.info and r.info["QD"] > 0

    def test_uncovered_sample_is_missing(self):
        r1 = _var("chr1", 500, "A", ["T", "<NON_REF>"], "1/1",
                  [0, 20, 0], [200, 60, 0, 210, 65, 220])
        ev = [_sample_evidence([r1]), _sample_evidence([])]
        recs = _merge_shard_sites(ev, ["s1", "s2"])
        r = recs[0]
        assert r.samples[1]["GT"] == "./."
        assert r.info["AN"] == 2
        assert r.info["AC"] == [2]
