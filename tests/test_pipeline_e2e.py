"""End-to-end pipeline tests: FASTQ → align → markdup → bqsr → htc → VCF,
plus the utility stages, through the stage functions and the CLI.

This is the in-repo analog of the reference's bats/behavioral tier
(test/cases/*.bats) + the validation tier (compareBAM/compareVCF): truth
comes from simulation; gates are variant recovery and format round-trips.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from falcon_genome_tpu import cli
from falcon_genome_tpu.config import Config, Machine
from falcon_genome_tpu.io.dna import decode_seq, revcomp_codes
from falcon_genome_tpu.io.bam import read_bam
from falcon_genome_tpu.io.fasta import write_fasta
from falcon_genome_tpu.io.fastq import write_fastq
from falcon_genome_tpu.io.vcf import read_vcf
from falcon_genome_tpu import stages


@pytest.fixture(scope="module")
def conf():
    c = Config(machine=Machine(8, 16), environ={}, load_files=False)
    c.set("gatk.ncontigs", 4)
    c.set("gatk.nprocs", 2)
    return c


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """A small diploid world: reference, truth variants, paired reads."""
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(11)
    chr1 = rng.integers(0, 4, 4000).astype(np.uint8)
    chr2 = rng.integers(0, 4, 2500).astype(np.uint8)
    ref_path = tmp / "ref.fa"
    write_fasta(ref_path, {"chr1": decode_seq(chr1),
                           "chr2": decode_seq(chr2)})

    # truth: het SNP chr1:1000, hom SNP chr2:800
    hap1_c1 = chr1.copy()
    hap2_c1 = chr1.copy()
    hap2_c1[1000] = (hap2_c1[1000] + 1) % 4
    hap_c2 = chr2.copy()
    hap_c2[800] = (hap_c2[800] + 2) % 4

    read_len, frag = 100, 250
    names, s1, q1, s2, q2 = [], [], [], [], []
    i = 0
    for contig, haps in (("chr1", (hap1_c1, hap2_c1)),
                         ("chr2", (hap_c2, hap_c2))):
        L = len(haps[0])
        for start in range(0, L - frag, 9):
            hap = haps[i % 2]
            r1 = hap[start:start + read_len]
            r2 = revcomp_codes(hap[start + frag - read_len:start + frag])
            names.append(f"frag{contig}_{start}")
            s1.append(decode_seq(r1))
            q1.append("I" * read_len)
            s2.append(decode_seq(r2))
            q2.append("I" * read_len)
            i += 1
    fq1 = tmp / "reads_1.fastq.gz"
    fq2 = tmp / "reads_2.fastq.gz"
    write_fastq(fq1, names, s1, q1)
    write_fastq(fq2, names, s2, q2)
    truth = {("chr1", 1001, "0/1"), ("chr2", 801, "1/1")}
    return dict(tmp=tmp, ref=str(ref_path), fq1=str(fq1), fq2=str(fq2),
                truth=truth, chr1=chr1, chr2=chr2)


@pytest.fixture(scope="module")
def aligned_bam(world, conf):
    out = world["tmp"] / "aligned.bam"
    stages.run_align(conf, world["ref"], str(out),
                     fastq1=world["fq1"], fastq2=world["fq2"],
                     sample_id="s1", read_group="rg0", force=True)
    return str(out)


class TestAlignStage:
    def test_spill_path_matches_in_memory(self, world, conf, aligned_bam):
        """Bucket-spill dataflow (bounded-memory WGS path) must produce
        the identical sorted BAM as the in-memory path."""
        from falcon_genome_tpu.io import native_ext
        if not native_ext.available():
            pytest.skip("spill path needs the native lib")
        import copy
        c2 = copy.deepcopy(conf)
        c2.set("tpu.align.spill_mb", 0)   # force spill
        c2.set("bwa.num_buckets", 7)
        out = world["tmp"] / "aligned_spill.bam"
        stages.run_align(c2, world["ref"], str(out),
                         fastq1=world["fq1"], fastq2=world["fq2"],
                         sample_id="s1", read_group="rg0", force=True)
        _, a = read_bam(aligned_bam)
        _, b = read_bam(str(out))
        assert len(a) == len(b)
        ka = sorted((r.qname, r.flag, r.tid, r.pos, r.seq, r.qual)
                    for r in a)
        kb = sorted((r.qname, r.flag, r.tid, r.pos, r.seq, r.qual)
                    for r in b)
        assert ka == kb
        # spilled output is coordinate-sorted and indexed
        coords = [(r.tid, r.pos) for r in b if not r.is_unmapped]
        assert coords == sorted(coords)
        assert Path(str(out) + ".bai").exists()

    def test_bam_written_sorted(self, aligned_bam):
        header, records = read_bam(aligned_bam)
        assert len(records) > 500
        mapped = [r for r in records if not r.is_unmapped]
        assert len(mapped) / len(records) > 0.98
        coords = [(r.tid, r.pos) for r in mapped]
        assert coords == sorted(coords)
        assert header.read_groups[0]["ID"] == "rg0"

    def test_proper_pairs(self, aligned_bam):
        _, records = read_bam(aligned_bam)
        proper = [r for r in records if r.flag & 0x2]
        assert len(proper) / len(records) > 0.9


class TestMarkdupBqsr:
    def test_markdup_runs(self, world, conf, aligned_bam):
        out = world["tmp"] / "dedup.bam"
        stages.run_markdup(conf, aligned_bam, str(out), force=True)
        _, records = read_bam(str(out))
        assert len(records) > 500

    def test_bqsr_chain(self, world, conf, aligned_bam):
        table = world["tmp"] / "recal.npz"
        stages.run_baserecal(conf, world["ref"], aligned_bam, str(table),
                             force=True)
        out = world["tmp"] / "recal.bam"
        stages.run_printreads(conf, world["ref"], aligned_bam,
                              str(table), str(out), force=True)
        _, records = read_bam(str(out))
        assert len(records) > 500
        # q40 ('I') reads with ~0 error rate: recalibrated quals go UP
        quals = np.frombuffer(records[0].qual.encode(), np.uint8) - 33
        assert quals.mean() >= 40


class TestHtcStage:
    def test_variants_recovered(self, world, conf, aligned_bam):
        out = world["tmp"] / "calls.vcf"
        stages.run_htc(conf, world["ref"], aligned_bam, str(out),
                       produce_vcf=True, sample="s1", force=True)
        _, recs = read_vcf(str(out))
        got = {(r.contig, r.pos, r.samples[0]["GT"]) for r in recs}
        for t in world["truth"]:
            assert t in got, f"missing truth variant {t}; got {got}"
        # no more than a couple of false positives on clean sim data
        assert len(recs) <= len(world["truth"]) + 2

    def test_gvcf_mode(self, world, conf, aligned_bam):
        out = world["tmp"] / "calls.g.vcf.gz"
        stages.run_htc(conf, world["ref"], aligned_bam, str(out),
                       sample="s1", force=True)
        _, recs = read_vcf(str(out))
        blocks = [r for r in recs if r.is_gvcf_block]
        assert blocks


class TestDownstreamStages:
    def test_ug_finds_snps(self, world, conf, aligned_bam):
        out = world["tmp"] / "ug.vcf"
        stages.run_ug(conf, world["ref"], aligned_bam, str(out),
                      sample="s1", force=True)
        _, recs = read_vcf(str(out))
        got = {(r.contig, r.pos) for r in recs}
        assert ("chr1", 1001) in got
        assert ("chr2", 801) in got

    def test_depth_summary(self, world, conf, aligned_bam):
        out = world["tmp"] / "depth"
        summary = stages.run_depth(conf, world["ref"], aligned_bam,
                                   str(out), sample="s1", force=True)
        text = Path(summary).read_text()
        mean = float(text.splitlines()[1].split("\t")[2])
        assert 10 < mean < 40  # ~100*2*2/9 ≈ 22x expected

    def test_depth_full_surface(self, world, conf, aligned_bam, tmp_path):
        """geneList + per-base + interval + cumulative outputs
        (DepthWorker.cpp:46-91, DepthCombineWorker.cpp:80-160)."""
        genes = tmp_path / "genes.list"
        genes.write_text("GENE1 chr1 900 1200\nGENE2 chr2 700 900\n")
        out = tmp_path / "depthfull"
        stages.run_depth(conf, world["ref"], aligned_bam, str(out),
                         sample="s1", gene_list=str(genes),
                         omit_base_output=False, omit_intervals=False,
                         force=True)
        # per-base coverage: Locus lines with the sample column
        base = Path(str(out)).read_text().splitlines()
        assert base[0].startswith("Locus\tTotal_Depth")
        assert "Depth_for_s1" in base[0]
        locus, depth = base[1000].split("\t")[:2]
        assert ":" in locus and int(depth) >= 0
        # gene summary: both genes with plausible coverage
        gene_lines = Path(str(out) + ".sample_gene_summary") \
            .read_text().splitlines()
        rows = {ln.split("\t")[0]: ln.split("\t") for ln in gene_lines[1:]}
        assert set(rows) == {"GENE1", "GENE2"}
        assert 5 < float(rows["GENE1"][2]) < 50   # avg cvg ~22x
        # interval summary has one row per shard interval
        intv = Path(str(out) + ".sample_interval_summary") \
            .read_text().splitlines()
        assert len(intv) > 2
        # cumulative counts monotone nonincreasing; proportions in [0,1]
        cc = Path(str(out) + ".sample_cumulative_coverage_counts") \
            .read_text().splitlines()
        vals = [int(x) for x in cc[1].split("\t")[1:]]
        assert all(a >= b for a, b in zip(vals, vals[1:]))
        props = Path(str(out) + ".sample_cumulative_coverage_proportions") \
            .read_text().splitlines()
        pv = [float(x) for x in props[1].split("\t")[1:]]
        assert max(pv) <= 1.0 and pv[0] == 1.0
        # statistics histogram sums to n_positions per sample
        st = Path(str(out) + ".sample_statistics").read_text().splitlines()
        assert st[1].startswith("sample_s1\t")

    def test_depth_cli_flags(self, world, conf, aligned_bam, tmp_path,
                             monkeypatch):
        import falcon_genome_tpu.config as config_mod
        monkeypatch.setattr(config_mod, "init", lambda: conf)
        out = tmp_path / "depthcli"
        rc = cli.main(["depth", "-r", world["ref"], "-i", aligned_bam,
                       "-o", str(out), "-b", "-v", "-S", "s1", "-f"])
        assert rc == 0
        assert not Path(str(out)).exists()          # -b omits base output
        assert not Path(str(out) + ".sample_interval_summary").exists()
        assert Path(str(out) + ".sample_summary").exists()

    def test_vcf_filter(self, world, conf, aligned_bam, tmp_path):
        src = world["tmp"] / "calls.vcf"
        out = tmp_path / "filtered.vcf"
        stages.run_vcf_filter(conf, world["ref"], str(src), str(out),
                              filter_expr="QUAL < 1000000",
                              filter_name="ALLQ", force=True)
        _, recs = read_vcf(str(out))
        assert all(r.filter == "ALLQ" for r in recs)

    def test_joint_genotyping(self, world, conf, aligned_bam, tmp_path):
        gdir = tmp_path / "gvcfs"
        gdir.mkdir()
        stages.run_htc(conf, world["ref"], aligned_bam,
                       str(gdir / "s1.g.vcf"), sample="s1", force=True)
        stages.run_htc(conf, world["ref"], aligned_bam,
                       str(gdir / "s2.g.vcf"), sample="s2", force=True)
        out = tmp_path / "joint.vcf"
        stages.run_joint(conf, world["ref"], str(gdir), str(out),
                         force=True)
        header, recs = read_vcf(str(out))
        assert header.samples == ["s1", "s2"]
        sites = {(r.contig, r.pos) for r in recs}
        assert ("chr1", 1001) in sites
        r = [x for x in recs if (x.contig, x.pos) == ("chr1", 1001)][0]
        assert r.samples[0]["GT"] == r.samples[1]["GT"] == "0/1"

    def test_concat(self, world, conf, tmp_path):
        parts = world["tmp"] / "calls.vcf.parts"
        out = tmp_path / "concat.vcf.gz"
        stages.run_concat(conf, str(parts), str(out), force=True)
        _, recs = read_vcf(str(out))
        assert recs


class TestCLI:
    def test_help(self, capsys):
        assert cli.main([]) == 0
        out = capsys.readouterr().out
        for cmd in ("align", "htc", "mutect2", "germline", "joint"):
            assert cmd in out

    def test_unknown_command_exit_code(self):
        assert cli.main(["frobnicate"]) == 1

    def test_conf_dump(self, capsys):
        assert cli.main(["conf"]) == 0
        assert "gatk.ncontigs" in capsys.readouterr().out

    def test_cli_align_and_htc(self, world, tmp_path, capsys):
        bam = tmp_path / "cli.bam"
        rc = cli.main(["align", "-r", world["ref"], "-o", str(bam),
                       "-1", world["fq1"], "-2", world["fq2"],
                       "-S", "s1", "-f", "-O", "gatk.ncontigs=4"])
        assert rc == 0
        vcf = tmp_path / "cli.vcf"
        rc = cli.main(["htc", "-r", world["ref"], "-i", str(bam),
                       "-o", str(vcf), "-v", "-f",
                       "-O", "gatk.ncontigs=4"])
        assert rc == 0
        _, recs = read_vcf(str(vcf))
        assert {(r.contig, r.pos) for r in recs} >= {
            ("chr1", 1001), ("chr2", 801)}

    def test_existing_output_refused_without_force(self, world, tmp_path):
        out = tmp_path / "x.bam"
        out.write_text("occupied")
        rc = cli.main(["markdup", "-i", world["ref"], "-o", str(out)])
        assert rc == 0 or rc == 3  # SilentExit(0) or FileNotFound paths
        assert out.read_text() == "occupied"  # never clobbered


class TestGatkPassthrough:
    def test_gatk4_style_dispatches(self, world, aligned_bam, tmp_path):
        out = tmp_path / "gp.vcf.gz"
        rc = cli.main(["gatk", "HaplotypeCaller", "-R", world["ref"],
                       "-I", aligned_bam, "-O", str(out), "-f"])
        assert rc == 0
        _, recs = read_vcf(str(out))
        got = {(r.contig, r.pos) for r in recs if not r.is_gvcf_block}
        assert ("chr1", 1001) in got

    def test_gatk3_style_dispatches(self, world, aligned_bam, tmp_path):
        out = tmp_path / "gp3.vcf"
        rc = cli.main(["gatk", "-T", "UnifiedGenotyper", "-R",
                       world["ref"], "-I", aligned_bam, "-o", str(out),
                       "-f"])
        assert rc == 0
        assert out.exists()

    def test_unknown_walker_rejected(self):
        assert cli.main(["gatk", "-T", "NopeWalker"]) == 1
