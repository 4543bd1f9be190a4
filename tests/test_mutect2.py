"""Mutect2 somatic caller tests: planted somatic vs germline variants."""
import numpy as np
import pytest

from falcon_genome_tpu.io.dna import decode_seq
from falcon_genome_tpu.models.mutect2 import (
    Mutect2, Mutect2Params, filter_mutect_calls)
from falcon_genome_tpu.io.vcf import VcfRecord

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
from test_haplotypecaller import simulate_reads  # noqa: E402


@pytest.fixture
def setting(rng):
    ref = rng.integers(0, 4, 600).astype(np.uint8)
    somatic = ref.copy()
    somatic[300] = (somatic[300] + 1) % 4
    return ref, somatic


class TestMutect2:
    def test_somatic_snv_called(self, rng, setting):
        ref, somatic = setting
        # tumor: ~50% somatic allele; normal: pure ref, deep enough that
        # NLOD (≈0.3 per informative ref read) clears the 2.2 threshold
        tumor = simulate_reads(somatic, ref, rng, n=80)
        normal = simulate_reads(ref, ref, rng, n=200)
        out = Mutect2().call_interval(tumor, normal, ref, "chr1", 0, 600)
        hits = [v for v in out if v.pos == 301]
        assert len(hits) == 1
        v = hits[0]
        assert v.alts == [decode_seq(somatic[300:301])]
        assert float(v.info["TLOD"]) > 5.3
        assert float(v.info["NLOD"]) > 2.2
        assert 0.2 < float(v.samples[0]["AF"]) < 0.8

    def test_germline_site_rejected(self, rng, setting):
        ref, somatic = setting
        # both tumor AND normal carry the het variant → germline, rejected
        tumor = simulate_reads(somatic, ref, rng, n=80)
        normal = simulate_reads(somatic, ref, rng, n=60)
        out = Mutect2().call_interval(tumor, normal, ref, "chr1", 0, 600)
        assert not [v for v in out if v.pos == 301]

    def test_tumor_only_mode(self, rng, setting):
        ref, somatic = setting
        tumor = simulate_reads(somatic, ref, rng, n=80)
        out = Mutect2().call_interval(tumor, None, ref, "chr1", 0, 600)
        hits = [v for v in out if v.pos == 301]
        assert len(hits) == 1
        assert "NLOD" not in hits[0].info

    def test_clean_data_no_calls(self, rng, setting):
        ref, _ = setting
        tumor = simulate_reads(ref, ref, rng, n=60)
        normal = simulate_reads(ref, ref, rng, n=60)
        out = Mutect2().call_interval(tumor, normal, ref, "chr1", 0, 600)
        assert out == []


class TestFilter:
    def test_filters_annotated(self):
        recs = [
            VcfRecord("chr1", 10, "A", ["G"], info={"TLOD": 20.0},
                      fmt=["GT", "AD", "AF"],
                      samples=[{"GT": "0/1", "AD": [10, 8], "AF": 0.4},
                               {"GT": "0/0", "AD": [20, 0], "AF": 0.0}]),
            VcfRecord("chr1", 20, "C", ["T"], info={"TLOD": 3.0},
                      fmt=["GT", "AD", "AF"],
                      samples=[{"GT": "0/1", "AD": [10, 1], "AF": 0.09}]),
            VcfRecord("chr1", 30, "G", ["A"], info={"TLOD": 30.0},
                      fmt=["GT", "AD", "AF"],
                      samples=[{"GT": "0/1", "AD": [5, 5], "AF": 0.5},
                               {"GT": "0/0", "AD": [10, 5], "AF": 0.33}]),
        ]
        out = filter_mutect_calls(recs)
        assert out[0].filter == "PASS"
        assert "weak_evidence" in out[1].filter
        assert "germline" in out[2].filter

    def test_strand_bias_filtered(self):
        # all 8 alt reads on the forward strand, ref reads balanced
        biased = VcfRecord("chr1", 40, "A", ["C"], info={"TLOD": 25.0},
                           fmt=["GT", "AD", "AF", "SB"],
                           samples=[{"GT": "0/1", "AD": [30, 8], "AF": 0.2,
                                     "SB": [15, 15, 8, 0]}])
        balanced = VcfRecord("chr1", 50, "A", ["C"], info={"TLOD": 25.0},
                             fmt=["GT", "AD", "AF", "SB"],
                             samples=[{"GT": "0/1", "AD": [30, 8],
                                       "AF": 0.2, "SB": [15, 15, 4, 4]}])
        out = filter_mutect_calls([biased, balanced])
        assert "strand_bias" in out[0].filter
        assert "strand_bias" not in out[1].filter

    def test_orientation_filtered(self):
        skewed = VcfRecord("chr1", 60, "C", ["A"],
                           info={"TLOD": 25.0, "F1R2": 9, "F2R1": 0},
                           fmt=["GT", "AD", "AF"],
                           samples=[{"GT": "0/1", "AD": [30, 9],
                                     "AF": 0.23}])
        even = VcfRecord("chr1", 70, "C", ["A"],
                         info={"TLOD": 25.0, "F1R2": 5, "F2R1": 4},
                         fmt=["GT", "AD", "AF"],
                         samples=[{"GT": "0/1", "AD": [30, 9], "AF": 0.23}])
        out = filter_mutect_calls([skewed, even])
        assert "orientation" in out[0].filter
        assert "orientation" not in out[1].filter

    def test_sb_annotated_by_caller(self, rng, setting):
        ref, alt = setting
        tumor = simulate_reads(alt, ref, rng, n=80)
        normal = simulate_reads(ref, ref, rng, n=200)
        out = Mutect2().call_interval(tumor, normal, ref, "chr1", 0, 600)
        assert out, "expected a somatic call"
        assert "SB" in out[0].samples[0]
        sb = out[0].samples[0]["SB"]
        assert len(sb) == 4 and sum(sb[2:]) > 0
        assert "F1R2" in out[0].info
