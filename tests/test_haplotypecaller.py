"""HaplotypeCaller end-to-end on simulated data with known variants.

The in-repo analog of the reference's compareVCF gate
(scripts/compareVCF.sh): truth is the simulation; the gate is recovering
the planted variants with correct genotypes.
"""
import numpy as np
import pytest

from falcon_genome_tpu.io.dna import decode_seq, encode_seq
from falcon_genome_tpu.io.sam import SamRecord, cigar_from_str
from falcon_genome_tpu.models.activeregion import (
    ActiveRegionParams, find_active_regions)
from falcon_genome_tpu.models.assembly import AssemblyParams, assemble_region
from falcon_genome_tpu.models.genotyper import (
    VariantEvent, events_from_alignment, genotype_sites)
from falcon_genome_tpu.models.haplotypecaller import (
    HaplotypeCaller, HTCParams)
from falcon_genome_tpu.ops.sw_ref import sw_align_ref


def simulate_reads(hap1, hap2, rng, n=60, read_len=80, qual=35,
                   start_offset=0):
    """Sample reads evenly from two haplotype sequences (diploid)."""
    records = []
    for i in range(n):
        hap = hap1 if i % 2 == 0 else hap2
        if len(hap) <= read_len:
            pos = 0
            L = len(hap)
        else:
            pos = rng.integers(0, len(hap) - read_len)
            L = read_len
        seq = hap[pos:pos + L]
        rec = SamRecord(f"r{i}", 0, 0, int(pos) + start_offset, 60,
                        cigar_from_str(f"{L}M"),
                        seq=decode_seq(seq), qual=chr(qual + 33) * L)
        records.append(rec)
    return records


class TestAssembly:
    def test_ref_only_when_no_variants(self, rng):
        ref = rng.integers(0, 4, 200).astype(np.uint8)
        reads = [ref[i:i + 80] for i in range(0, 120, 10)]
        res = assemble_region(ref, reads, AssemblyParams(kmer_sizes=(15,)))
        assert not res.fallback
        assert len(res.haplotypes) == 1

    def test_snp_haplotype_assembled(self, rng):
        ref = rng.integers(0, 4, 200).astype(np.uint8)
        alt = ref.copy()
        alt[100] = (alt[100] + 1) % 4
        reads = [alt[i:i + 80] for i in range(40, 100, 5)]
        reads += [ref[i:i + 80] for i in range(40, 100, 5)]
        res = assemble_region(ref, reads, AssemblyParams(kmer_sizes=(15,)))
        seqs = {bytes(h) for h in res.haplotypes}
        assert bytes(alt) in seqs
        assert bytes(ref) in seqs

    def test_deletion_haplotype(self, rng):
        ref = rng.integers(0, 4, 200).astype(np.uint8)
        alt = np.concatenate([ref[:100], ref[110:]])
        reads = [alt[i:i + 70] for i in range(40, 100, 4)]
        res = assemble_region(ref, reads, AssemblyParams(kmer_sizes=(15,)))
        assert bytes(alt) in {bytes(h) for h in res.haplotypes}


class TestActiveRegions:
    def test_quiet_pileup_no_regions(self, rng):
        ref = rng.integers(0, 4, 500).astype(np.uint8)
        recs = simulate_reads(ref, ref, rng, n=40)
        regions = find_active_regions(recs, ref, 0, 500)
        assert regions == []

    def test_snp_cluster_detected(self, rng):
        ref = rng.integers(0, 4, 500).astype(np.uint8)
        alt = ref.copy()
        alt[250] = (alt[250] + 1) % 4
        recs = simulate_reads(ref, alt, rng, n=60)
        regions = find_active_regions(recs, ref, 0, 500)
        assert any(lo <= 250 < hi for lo, hi in regions)


class TestEvents:
    def test_snp_event(self, rng):
        ref = rng.integers(0, 4, 120).astype(np.uint8)
        hap = ref.copy()
        hap[60] = (hap[60] + 1) % 4
        res = sw_align_ref(hap, ref)
        evs = events_from_alignment(hap, ref, res)
        assert evs == [VariantEvent(60, decode_seq(ref[60:61]),
                                    decode_seq(hap[60:61]))]

    def test_deletion_event(self, rng):
        ref = rng.integers(0, 4, 120).astype(np.uint8)
        hap = np.concatenate([ref[:60], ref[65:]])
        res = sw_align_ref(hap, ref)
        evs = events_from_alignment(hap, ref, res)
        dels = [e for e in evs if len(e.ref) > len(e.alt)]
        assert len(dels) == 1
        assert len(dels[0].ref) - len(dels[0].alt) == 5

    def test_insertion_event(self, rng):
        ref = rng.integers(0, 4, 120).astype(np.uint8)
        ins = rng.integers(0, 4, 4).astype(np.uint8)
        hap = np.concatenate([ref[:60], ins, ref[60:]])
        res = sw_align_ref(hap, ref)
        evs = events_from_alignment(hap, ref, res)
        inss = [e for e in evs if len(e.alt) > len(e.ref)]
        assert len(inss) == 1
        assert len(inss[0].alt) - len(inss[0].ref) == 4


class TestGenotyper:
    def test_het_call(self):
        # 2 haps (ref, alt-SNP); reads split 50/50
        hap_events = [[], [VariantEvent(10, "A", "G")]]
        n = 20
        logp = np.full((n, 2), -10.0)
        for i in range(n):
            logp[i, i % 2] = -1.0  # each read strongly favors one hap
        calls = genotype_sites(hap_events, logp)
        assert len(calls) == 1
        c = calls[0]
        assert c.gt == (0, 1)
        assert c.qual > 50
        assert abs(c.ad[0] - 10) <= 1 and abs(c.ad[1] - 10) <= 1

    def test_hom_alt_call(self):
        hap_events = [[], [VariantEvent(5, "C", "T")]]
        logp = np.tile(np.array([[-8.0, -1.0]]), (16, 1))
        calls = genotype_sites(hap_events, logp)
        assert calls[0].gt == (1, 1)

    def test_hom_ref_low_qual(self):
        hap_events = [[], [VariantEvent(5, "C", "T")]]
        logp = np.tile(np.array([[-1.0, -8.0]]), (16, 1))
        calls = genotype_sites(hap_events, logp)
        assert calls[0].gt == (0, 0)
        assert calls[0].qual == 0


class TestHaplotypeCallerE2E:
    @pytest.fixture
    def params(self):
        return HTCParams(
            assembly=AssemblyParams(kmer_sizes=(15, 21)),
            active=ActiveRegionParams(threshold=0.02),
        )

    def test_het_snp_called(self, rng, params):
        ref = rng.integers(0, 4, 600).astype(np.uint8)
        alt = ref.copy()
        alt[300] = (alt[300] + 1) % 4
        recs = simulate_reads(ref, alt, rng, n=80)
        hc = HaplotypeCaller(params)
        out = hc.call_interval(recs, ref, "chr1", 0, 600)
        snps = [v for v in out if v.pos == 301]
        assert len(snps) == 1
        v = snps[0]
        assert v.ref == decode_seq(ref[300:301])
        assert v.alts == [decode_seq(alt[300:301])]
        assert v.samples[0]["GT"] == "0/1"
        assert v.qual > 30

    def test_hom_deletion_called(self, rng, params):
        ref = rng.integers(0, 4, 600).astype(np.uint8)
        alt = np.concatenate([ref[:300], ref[306:]])
        recs = simulate_reads(alt, alt, rng, n=80)
        hc = HaplotypeCaller(params)
        out = hc.call_interval(recs, ref, "chr1", 0, 600)
        dels = [v for v in out if len(v.ref) > len(v.alts[0])]
        assert len(dels) == 1
        assert dels[0].samples[0]["GT"] == "1/1"
        assert len(dels[0].ref) - len(dels[0].alts[0]) == 6

    def test_no_false_positives_on_clean_data(self, rng, params):
        ref = rng.integers(0, 4, 600).astype(np.uint8)
        recs = simulate_reads(ref, ref, rng, n=60)
        hc = HaplotypeCaller(params)
        out = hc.call_interval(recs, ref, "chr1", 0, 600)
        assert out == []

    def test_gvcf_blocks(self, rng, params):
        params.emit_gvcf = True
        ref = rng.integers(0, 4, 400).astype(np.uint8)
        alt = ref.copy()
        alt[200] = (alt[200] + 1) % 4
        recs = simulate_reads(ref, alt, rng, n=60)
        hc = HaplotypeCaller(params)
        out = hc.call_interval(recs, ref, "chr1", 0, 400)
        blocks = [v for v in out if v.is_gvcf_block]
        variants = [v for v in out if not v.is_gvcf_block]
        assert len(variants) == 1 and variants[0].pos == 201
        assert blocks
        # blocks + variants tile the interval
        covered = set()
        for v in out:
            if v.is_gvcf_block:
                covered.update(range(v.pos, int(v.info["END"]) + 1))
            else:
                covered.add(v.pos)
        assert covered == set(range(1, 401))
