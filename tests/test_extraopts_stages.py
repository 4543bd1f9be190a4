"""Round-3 surface: --extra-options on every stage (ref Worker.h:38-58
applies the multimap to *every* worker), library-aware duplicate keys,
refseq geneList / deletion-aware depth, joint streaming + stand_call_conf,
and front-half resume (align/markdup via germline work artifacts, bqsr
table reuse, depth shard parts, joint parts)."""
import os
import time
from pathlib import Path

import numpy as np
import pytest

from falcon_genome_tpu.config import Config, Machine
from falcon_genome_tpu.io.bam import write_bam
from falcon_genome_tpu.io.dna import decode_seq
from falcon_genome_tpu.io.fasta import write_fasta
from falcon_genome_tpu.io.sam import (FLAG_DUP, SamHeader, SamRecord,
                                      cigar_from_str)
from falcon_genome_tpu.io.vcf import (VcfHeader, VcfRecord, read_vcf,
                                      write_vcf)


def _conf(**kw):
    c = Config(machine=Machine(8, 16), environ={}, load_files=False)
    for k, v in kw.items():
        c.set(k, v)
    return c


def _mini_ref(tmp_path, rng, n=2000):
    ref = rng.integers(0, 4, n).astype(np.uint8)
    p = tmp_path / "ref.fa"
    write_fasta(p, {"chr1": decode_seq(ref)})
    return ref, p


def _read(name, pos, seq, qual=None, flag=0, cigar="auto", rg=None,
          mapq=60):
    r = SamRecord(name, flag, 0, pos, mapq,
                  cigar_from_str(f"{len(seq)}M" if cigar == "auto"
                                 else cigar),
                  seq=seq, qual=qual or ("I" * len(seq)))
    if rg:
        r.set_tag("RG", "Z", rg)
    return r


class TestAlignExtraOpts:
    def test_parse_rg_line(self):
        from falcon_genome_tpu.stages.align import _parse_rg_line
        tags = _parse_rg_line(r"@RG\tID:rg7\tSM:s1\tLB:libX\tPL:ILM")
        assert tags == {"ID": "rg7", "SM": "s1", "LB": "libX",
                        "PL": "ILM"}
        tags = _parse_rg_line("@RG\tID:a\tLB:b")  # real tabs
        assert tags == {"ID": "a", "LB": "b"}

    def test_cli_forwards_to_align(self, tmp_path, monkeypatch):
        from falcon_genome_tpu import cli, stages
        seen = {}

        def fake(conf, ref, out, **kw):
            seen.update(kw)
            return [out]
        monkeypatch.setattr(stages, "run_align", fake)
        ref = tmp_path / "r.fa"
        ref.write_text(">c\nACGT\n")
        rc = cli.main(["align", "-r", str(ref), "-1", "x.fq",
                       "-o", str(tmp_path / "o.bam"),
                       "--extra-options", "--chunk_size 512"])
        assert rc == 0
        assert seen["extra_opts"] == ["--chunk_size 512"]


class TestMarkdupExtraOptsAndLibraries:
    def _cols(self, recs):
        from falcon_genome_tpu.io.columns import RecordColumns
        return RecordColumns.from_records(recs)

    def test_library_aware_keys(self):
        """Same coordinates, different LB → NOT duplicates (Picard
        groups per library); same LB → duplicates."""
        from falcon_genome_tpu.bamops import mark_duplicates_columns
        seq = "ACGTACGTAC"
        recs = [
            _read("a1", 100, seq, qual="I" * 10, rg="rgA"),
            _read("b1", 100, seq, qual="H" * 10, rg="rgB"),
        ]
        rg_to_lib = {"rgA": "lib1", "rgB": "lib2"}
        cols, ndup = mark_duplicates_columns(self._cols(recs),
                                             rg_to_lib=rg_to_lib)
        assert ndup == 0
        # same library → the lower-quality one is the duplicate
        rg_to_lib = {"rgA": "lib1", "rgB": "lib1"}
        cols, ndup = mark_duplicates_columns(self._cols(recs),
                                             rg_to_lib=rg_to_lib)
        assert ndup == 1
        flags = cols.fixed[:, 3]
        assert flags[1] & FLAG_DUP and not flags[0] & FLAG_DUP

    def test_no_map_matches_old_behavior(self, rng):
        from falcon_genome_tpu.bamops import mark_duplicates_columns
        seq = "ACGTACGTAC"
        recs = [_read("a1", 100, seq), _read("b1", 100, seq)]
        _, ndup = mark_duplicates_columns(self._cols(recs))
        assert ndup == 1

    def test_remove_duplicates_flag(self, tmp_path):
        """markdup --extra-options '-r' drops duplicate records
        (sambamba markdup -r)."""
        from falcon_genome_tpu.io.bam import read_bam
        from falcon_genome_tpu.stages.bamstages import run_markdup
        header = SamHeader(contigs=[("chr1", 2000)])
        seq = "ACGTACGTAC"
        recs = [_read("a1", 100, seq, qual="I" * 10),
                _read("b1", 100, seq, qual="H" * 10),
                _read("c1", 500, seq)]
        bam = tmp_path / "in.bam"
        write_bam(bam, header, recs)
        out = tmp_path / "out.bam"
        run_markdup(_conf(), str(bam), str(out), force=True,
                    extra_opts=["-r"])
        _, got = read_bam(str(out))
        assert sorted(r.qname for r in got) == ["a1", "c1"]

    def test_optical_grid_matches_large_stack(self):
        """Grid-hashed optical detection on a big one-locus stack (the
        O(n²) pathological case) finds exactly the close pairs."""
        from falcon_genome_tpu.bamops import mark_duplicates_columns
        seq = "ACGTACGTAC"
        recs = []
        # 60 dups at one locus: 30 clustered within 50px, 30 spread far
        for i in range(30):
            recs.append(_read(f"M:1:FC:1:1101:{1000 + i}:{2000 + i}",
                              100, seq, qual="I" * 10))
        for i in range(30):
            recs.append(_read(f"M:1:FC:1:1101:{100000 + i * 5000}:5",
                              100, seq, qual="H" * 10))
        _, ndup, m = mark_duplicates_columns(self._cols(recs),
                                             return_metrics=True)
        assert ndup == 59
        # every clustered member has a near neighbor; spread ones don't
        # (keeper is in the cluster — one of the I-quality reads)
        assert m.optical_duplicates == 29


class TestDepthExtraOptsAndFidelity:
    def _bam(self, tmp_path, rng, ref):
        header = SamHeader(contigs=[("chr1", len(ref))])
        recs = []
        for i in range(40):
            pos = int(rng.integers(0, len(ref) - 60))
            recs.append(_read(f"r{i}", pos, decode_seq(ref[pos:pos + 60])))
        recs.sort(key=lambda r: r.pos)
        bam = tmp_path / "d.bam"
        write_bam(bam, header, recs)
        return bam

    def test_refseq_gene_list_formats(self, tmp_path):
        from falcon_genome_tpu.stages.depth import read_gene_list
        p = tmp_path / "refGene.txt"
        p.write_text(
            # refGene: bin name chrom strand txStart txEnd cdsStart
            # cdsEnd exonCount exonStarts exonEnds score name2 ...
            "585\tNM_001\tchr1\t+\t100\t500\t120\t480\t2\t"
            "100,300,\t200,500,\t0\tGENE1\tcmpl\tcmpl\t0,0,\n")
        genes = read_gene_list(str(p))
        assert genes[0].name == "GENE1"
        assert (genes[0].contig, genes[0].start, genes[0].end) == \
            ("chr1", 101, 500)
        p2 = tmp_path / "refFlat.txt"
        p2.write_text("G2\tNM_002\tchr2\t-\t10\t90\t10\t90\t1\t10,\t90,\n")
        g2 = read_gene_list(str(p2))[0]
        assert (g2.name, g2.contig, g2.start, g2.end) == \
            ("G2", "chr2", 11, 90)
        # flat fallback still accepted
        p3 = tmp_path / "flat.txt"
        p3.write_text("G3 chr1 5 50\n")
        g3 = read_gene_list(str(p3))[0]
        assert (g3.name, g3.start, g3.end) == ("G3", 5, 50)

    def test_deletion_bases_excluded(self, tmp_path, rng):
        """GATK DepthOfCoverage default: deletion spans don't count."""
        from falcon_genome_tpu.io.intervals import Interval
        from falcon_genome_tpu.stages.bamstages import BamInputSource
        from falcon_genome_tpu.stages.depth import _interval_depths
        ref, _ = _mini_ref(tmp_path, rng, 300)
        header = SamHeader(contigs=[("chr1", 300)])
        # 10M5D10M at pos 100: covers [100,110) and [115,125), not the D
        recs = [_read("d1", 100, decode_seq(ref[100:120]),
                      cigar="10M5D10M")]
        bam = tmp_path / "del.bam"
        write_bam(bam, header, recs)
        src = BamInputSource(str(bam))
        samples, depth = _interval_depths(
            src, Interval("chr1", 91, 140), src.header, "S")
        d = depth[0]
        base = 90  # interval start-1 (0-based offset of position 91)
        assert d[100 - base] == 1 and d[109 - base] == 1
        assert d[110 - base] == 0 and d[114 - base] == 0  # deleted span
        assert d[115 - base] == 1 and d[124 - base] == 1
        assert d[125 - base] == 0

    def test_ct_and_mmq_extra_options(self, tmp_path, rng):
        from falcon_genome_tpu.stages.depth import run_depth
        ref, ref_fa = _mini_ref(tmp_path, rng)
        header = SamHeader(contigs=[("chr1", len(ref))])
        recs = [_read("hi", 100, decode_seq(ref[100:160]), mapq=60),
                _read("lo", 100, decode_seq(ref[100:160]), mapq=5)]
        bam = tmp_path / "q.bam"
        write_bam(bam, header, recs)
        conf = _conf(**{"gatk.ncontigs": 1})
        out = tmp_path / "cov"
        run_depth(conf, str(ref_fa), str(bam), str(out), force=True,
                  omit_intervals=True,
                  extra_opts=["-ct 4 -ct 7 -mmq 20"])
        summary = (out.parent / (out.name + ".sample_summary")).read_text()
        assert "%_bases_above_4" in summary and \
            "%_bases_above_7" in summary
        stats = (out.parent / (out.name + ".sample_statistics")).read_text()
        rows = stats.splitlines()[1].split("\t")
        # mapq-5 read excluded → max depth is 1, never 2
        assert int(rows[1 + 1]) == 60   # depth_1 count = 60 positions
        assert int(rows[1 + 2]) == 0    # depth_2 empty


class TestVcfFilterExtraOpts:
    def test_additional_filter_pairs(self, tmp_path):
        from falcon_genome_tpu.stages.vcfstages import run_vcf_filter
        header = VcfHeader(contigs=[("chr1", 1000)], samples=[])
        recs = [VcfRecord(contig="chr1", pos=10, ref="A", alts=["T"],
                          qual=50.0, info={"DP": 3}),
                VcfRecord(contig="chr1", pos=20, ref="C", alts=["G"],
                          qual=5.0, info={"DP": 100}),
                VcfRecord(contig="chr1", pos=30, ref="G", alts=["C"],
                          qual=50.0, info={"DP": 100})]
        vin = tmp_path / "in.vcf"
        write_vcf(vin, header, recs)
        out = tmp_path / "out.vcf"
        run_vcf_filter(
            _conf(), "unused.fa", str(vin), str(out),
            filter_expr="QUAL < 10", filter_name="LowQual", force=True,
            # space-split parse (Worker.h:38-58): expression must be a
            # single token, as in the reference's bats scenarios
            extra_opts=["--filterExpression DP<5 --filterName LowDepth"])
        _, got = read_vcf(str(out))
        by_pos = {r.pos: r.filter for r in got}
        assert by_pos[10] == "LowDepth"
        assert by_pos[20] == "LowQual"
        assert by_pos[30] == "PASS"


def _gvcf(tmp_path, name, sample, rows, contig_len=4000):
    """rows: (pos, ref, alt, qual) variant or (pos, end) hom-ref block."""
    header = VcfHeader(contigs=[("chr1", contig_len)], samples=[sample],
                       meta=['##INFO=<ID=END,Number=1,Type=Integer,'
                             'Description="block end">'])
    recs = []
    for row in rows:
        if len(row) == 2:
            recs.append(VcfRecord(
                contig="chr1", pos=row[0], ref="A", alts=["<NON_REF>"],
                info={"END": row[1]}, fmt=["GT", "DP", "GQ"],
                samples=[{"GT": "0/0", "DP": 20, "GQ": 60}]))
        else:
            pos, ref, alt, qual = row
            recs.append(VcfRecord(
                contig="chr1", pos=pos, ref=ref, alts=[alt, "<NON_REF>"],
                qual=qual, fmt=["GT", "DP", "GQ", "PL"],
                samples=[{"GT": "0/1", "DP": 20, "GQ": 60,
                          "PL": [int(qual), 0, 80, 90, 90, 120]}]))
    path = str(tmp_path / name)
    write_vcf(path, header, recs)
    return path


class TestJointStreamingAndExtraOpts:
    def test_unindexed_inputs_get_indexed_sidecars(self, tmp_path):
        """Plain-vcf gVCFs are bgzip+tabix'd once (no whole-file RAM
        cache) and the merge still sees every record."""
        from falcon_genome_tpu.stages.vcfstages import run_joint
        _gvcf(tmp_path, "s1.g.vcf", "S1",
              [(1, 499), (500, "A", "T", 60.0), (501, 4000)])
        _gvcf(tmp_path, "s2.g.vcf", "S2",
              [(1, 4000)])
        out = tmp_path / "joint.vcf"
        conf = _conf(**{"gatk.joint.ncontigs": 3})
        run_joint(conf, _fa(tmp_path), str(tmp_path), str(out),
                  force=True)
        sidecars = list((out.parent / "joint.vcf.parts" /
                         "indexed").glob("*.gz"))
        assert len(sidecars) == 2
        assert all(Path(str(s) + ".tbi").exists() for s in sidecars)
        _, recs = read_vcf(str(out))
        assert len(recs) == 1 and recs[0].pos == 500
        assert len(recs[0].samples) == 2

    def test_stand_call_conf_threshold(self, tmp_path):
        from falcon_genome_tpu.stages.vcfstages import run_joint
        _gvcf(tmp_path, "s1.g.vcf", "S1",
              [(100, "A", "T", 80.0), (101, 3999),
               (2000, "C", "G", 4.0)])
        out = tmp_path / "joint.vcf"
        conf = _conf(**{"gatk.joint.ncontigs": 2})
        run_joint(conf, _fa(tmp_path), str(tmp_path), str(out),
                  force=True,
                  extra_opts=["-stand_call_conf 30"])
        _, recs = read_vcf(str(out))
        assert [r.pos for r in recs] == [100]

    def test_joint_resume_reuses_parts(self, tmp_path):
        from falcon_genome_tpu.stages.vcfstages import run_joint
        _gvcf(tmp_path, "s1.g.vcf", "S1", [(100, "A", "T", 80.0)])
        out = tmp_path / "joint.vcf"
        conf = _conf(**{"gatk.joint.ncontigs": 2})
        run_joint(conf, _fa(tmp_path), str(tmp_path), str(out),
                  force=True)
        parts = sorted((out.parent / "joint.vcf.parts").glob("part-*.vcf"))
        assert parts
        mtimes = [p.stat().st_mtime_ns for p in parts]
        os.remove(out)
        time.sleep(0.02)
        run_joint(conf, _fa(tmp_path), str(tmp_path), str(out),
                  force=False)
        assert [p.stat().st_mtime_ns for p in parts] == mtimes


def _fa(tmp_path):
    p = tmp_path / "jref.fa"
    if not p.exists():
        write_fasta(p, {"chr1": "ACGT" * 1000})
    return str(p)


class TestBqsrExtraOptsAndResume:
    def _inputs(self, tmp_path, rng):
        ref, ref_fa = _mini_ref(tmp_path, rng)
        header = SamHeader(contigs=[("chr1", len(ref))],
                           read_groups=[{"ID": "rgA", "SM": "s"}])
        recs = []
        for i in range(80):
            pos = int(rng.integers(0, len(ref) - 60))
            seq = ref[pos:pos + 60].copy()
            err = rng.random(60) < 0.05
            seq = np.where(err, (seq + 1) % 4, seq)
            q = (rng.integers(10, 40, 60) + 33).astype(np.uint8)
            r = _read(f"r{i}", pos, decode_seq(seq),
                      qual=q.tobytes().decode("latin1"), rg="rgA")
            recs.append(r)
        recs.sort(key=lambda r: r.pos)
        bam = tmp_path / "b.bam"
        write_bam(bam, header, recs)
        return ref, ref_fa, bam

    def test_baserecal_known_sites_via_extra_options(self, tmp_path, rng):
        from falcon_genome_tpu.bqsr import RecalTable
        from falcon_genome_tpu.stages.bqsr import run_baserecal
        ref, ref_fa, bam = self._inputs(tmp_path, rng)
        known = tmp_path / "known.vcf"
        header = VcfHeader(contigs=[("chr1", len(ref))], samples=[])
        write_vcf(known, header, [
            VcfRecord(contig="chr1", pos=p, ref="A", alts=["T"])
            for p in range(1, len(ref), 3)])
        conf = _conf(**{"gatk.ncontigs": 2})
        t1 = run_baserecal(conf, str(ref_fa), str(bam),
                           str(tmp_path / "t1.npz"), force=True)
        t2 = run_baserecal(conf, str(ref_fa), str(bam),
                           str(tmp_path / "t2.npz"), force=True,
                           extra_opts=[f"-knownSites {known}"])
        obs1 = RecalTable.load(t1).qual_obs.sum()
        obs2 = RecalTable.load(t2).qual_obs.sum()
        assert obs2 < obs1  # known positions excluded from covariates

    def test_known_sites_streamed_per_shard(self, tmp_path, rng):
        """KnownSites tabix-streams per shard: positions match the
        whole-file expansion, and the unindexed input gets a .gz+.tbi
        sidecar instead of a whole-file Python set."""
        from falcon_genome_tpu.io.intervals import Interval
        from falcon_genome_tpu.stages.bqsr import KnownSites
        header = SamHeader(contigs=[("chr1", 2000)])
        vhdr = VcfHeader(contigs=[("chr1", 2000)], samples=[])
        rows = [VcfRecord(contig="chr1", pos=100, ref="ACG", alts=["A"]),
                VcfRecord(contig="chr1", pos=500, ref="T", alts=["G"]),
                VcfRecord(contig="chr1", pos=1500, ref="G", alts=["C"])]
        kv = tmp_path / "known.vcf"
        write_vcf(kv, vhdr, rows)
        ks = KnownSites([str(kv)], header, str(tmp_path / "idx"))
        got = ks.for_shard([Interval("chr1", 1, 1000)])
        assert sorted(got[0].tolist()) == [99, 100, 101, 499]
        got2 = ks.for_shard([Interval("chr1", 1001, 2000)])
        assert sorted(got2[0].tolist()) == [1499]
        assert list((tmp_path / "idx").glob("*.tbi"))

    def test_printreads_preserve_qscores(self, tmp_path, rng):
        from falcon_genome_tpu.io.bam import read_bam
        from falcon_genome_tpu.stages.bqsr import (run_baserecal,
                                                   run_printreads)
        ref, ref_fa, bam = self._inputs(tmp_path, rng)
        conf = _conf(**{"gatk.ncontigs": 1})
        table = run_baserecal(conf, str(ref_fa), str(bam),
                              str(tmp_path / "t.npz"), force=True)
        out = tmp_path / "pr.bam"
        run_printreads(conf, str(ref_fa), str(bam), table, str(out),
                       force=True,
                       extra_opts=["--preserve_qscores_less_than 64"])
        # threshold above every input qual (10..40) → nothing recalibrated
        _, got = read_bam(str(out))
        _, orig = read_bam(str(bam))
        assert {r.qname: r.qual for r in got} == \
            {r.qname: r.qual for r in orig}

    def test_bqsr_chain_reuses_table(self, tmp_path, rng, monkeypatch):
        from falcon_genome_tpu.stages import bqsr as bqsr_mod
        ref, ref_fa, bam = self._inputs(tmp_path, rng)
        conf = _conf(**{"gatk.ncontigs": 1})
        out = tmp_path / "recal.bam"
        bqsr_mod.run_bqsr(conf, str(ref_fa), str(bam), str(out),
                          force=True)
        table = tmp_path / "recal.recal.npz"
        assert table.exists()

        def boom(*a, **kw):
            raise AssertionError("baserecal re-ran despite existing table")
        monkeypatch.setattr(bqsr_mod, "run_baserecal", boom)
        os.remove(out)
        bqsr_mod.run_bqsr(conf, str(ref_fa), str(bam), str(out),
                          force=False)
        assert out.exists()


class TestGermlineResume:
    def test_work_artifacts_reused(self, tmp_path, monkeypatch):
        from falcon_genome_tpu.stages import germline as g
        calls = []

        def fake_align(conf, ref, out, **kw):
            calls.append("align")
            Path(out).with_suffix("").mkdir(parents=True, exist_ok=True)
            return [out]

        def fake_markdup(conf, inp, out, **kw):
            calls.append("markdup")
            Path(out).write_bytes(b"BAM")
            return out

        def fake_bqsr(conf, ref, inp, out, **kw):
            calls.append("bqsr")
            Path(out).mkdir(parents=True, exist_ok=True)
            return out

        def fake_htc(conf, ref, bam, out, **kw):
            calls.append("htc")
            Path(out).write_text("vcf")
            return out
        monkeypatch.setattr(g, "run_align", fake_align)
        monkeypatch.setattr(g, "run_markdup", fake_markdup)
        monkeypatch.setattr(g, "run_bqsr", fake_bqsr)
        monkeypatch.setattr(g, "run_htc", fake_htc)
        conf = _conf()
        out = tmp_path / "o.vcf"
        g.run_germline(conf, "r.fa", str(out), fastq1="x.fq", force=True)
        assert calls == ["align", "markdup", "bqsr", "htc"]
        # kill-and-rerun: output gone, work artifacts + markers remain
        calls.clear()
        os.remove(out)
        g.run_germline(conf, "r.fa", str(out), fastq1="x.fq", force=False)
        assert calls == ["htc"]  # align + markdup + bqsr reused
        # -f discards the work dir and recomputes
        calls.clear()
        g.run_germline(conf, "r.fa", str(out), fastq1="x.fq", force=True)
        assert calls == ["align", "markdup", "bqsr", "htc"]


class TestStreamedMarkdup:
    def _bucket_tree(self, tmp_path, rng, n_buckets=6, n_pairs=400):
        """Simulated position-bucketed part tree with planted dup pairs,
        constant quals (score ties → name tie-break), optical pairs."""
        from falcon_genome_tpu.io.columns import RecordColumns
        G = 60_000
        header = SamHeader(contigs=[("chr1", G)],
                           read_groups=[{"ID": "rg0", "SM": "s",
                                         "LB": "lib0"}])
        recs = []
        for i in range(n_pairs):
            pos = int(rng.integers(0, G - 500))
            mpos = pos + 300
            name = f"M:1:FC:1:1101:{int(rng.integers(1, 30000))}:" \
                f"{int(rng.integers(1, 30000))}:p{i}"
            seq = "ACGTACGTAC"
            for ndup in range(1 + (i % 3 == 0) + (i % 9 == 0)):
                nm = name if ndup == 0 else \
                    f"M:1:FC:1:1101:{int(rng.integers(1, 30000))}:" \
                    f"{int(rng.integers(1, 30000))}:p{i}d{ndup}"
                r1 = _read(nm, pos, seq, flag=0x63, rg="rg0")
                r2 = _read(nm, mpos, seq, flag=0x93, rg="rg0")
                r1.mtid, r1.mpos = 0, mpos
                r2.mtid, r2.mpos = 0, pos
                recs.extend([r1, r2])
        recs.sort(key=lambda r: r.pos)
        d = tmp_path / "buckets"
        d.mkdir()
        per = (G + n_buckets - 1) // n_buckets
        by_bucket = {}
        for r in recs:
            by_bucket.setdefault(min(r.pos // per, n_buckets - 1),
                                 []).append(r)
        for bi, rs in sorted(by_bucket.items()):
            write_bam(d / f"part-{bi:06d}.bam", header, rs)
        return d, header, recs

    def test_streamed_equals_in_memory(self, tmp_path, rng):
        from falcon_genome_tpu.io.bam import read_bam
        from falcon_genome_tpu.stages.bamstages import run_markdup
        d, header, recs = self._bucket_tree(tmp_path, rng)
        conf_mem = _conf(**{"tpu.bam.stream_mb": 10_000})
        conf_str = _conf(**{"tpu.bam.stream_mb": 0})
        out_mem = tmp_path / "mem.bam"
        out_str = tmp_path / "str.bam"
        run_markdup(conf_mem, str(d), str(out_mem), force=True)
        run_markdup(conf_str, str(d), str(out_str), force=True)
        _, a = read_bam(str(out_mem))
        _, b = read_bam(str(out_str))
        assert len(a) == len(b) == len(recs)
        ka = sorted((r.qname, r.pos, r.flag) for r in a)
        kb = sorted((r.qname, r.pos, r.flag) for r in b)
        assert ka == kb  # identical duplicate decisions
        # streamed output is coordinate-sorted
        keys = [(r.tid if not r.is_unmapped else 1 << 30, r.pos)
                for r in b]
        assert keys == sorted(keys)
        assert any(r.flag & FLAG_DUP for r in b)

    def test_streamed_remove_duplicates(self, tmp_path, rng):
        from falcon_genome_tpu.io.bam import read_bam
        from falcon_genome_tpu.stages.bamstages import run_markdup
        d, header, recs = self._bucket_tree(tmp_path, rng)
        conf = _conf(**{"tpu.bam.stream_mb": 0})
        out = tmp_path / "rm.bam"
        run_markdup(conf, str(d), str(out), force=True,
                    extra_opts=["-r"])
        _, got = read_bam(str(out))
        assert got and all(not (r.flag & FLAG_DUP) for r in got)
        assert len(got) < len(recs)


class TestDepthResume:
    def test_shard_parts_reused(self, tmp_path, rng):
        from falcon_genome_tpu.stages.depth import run_depth
        ref, ref_fa = _mini_ref(tmp_path, rng)
        header = SamHeader(contigs=[("chr1", len(ref))])
        recs = [_read(f"r{i}", int(rng.integers(0, len(ref) - 60)),
                      decode_seq(ref[:60])) for i in range(20)]
        recs.sort(key=lambda r: r.pos)
        bam = tmp_path / "d.bam"
        write_bam(bam, header, recs)
        conf = _conf(**{"gatk.ncontigs": 2})
        out = tmp_path / "cov"
        run_depth(conf, str(ref_fa), str(bam), str(out), force=True,
                  omit_intervals=True)
        parts = sorted(Path(str(out) + ".parts").glob("*.depth.pkl"))
        assert parts
        mtimes = [p.stat().st_mtime_ns for p in parts]
        summary = Path(str(out) + ".sample_summary")
        first = summary.read_text()
        os.remove(summary)
        time.sleep(0.02)
        run_depth(conf, str(ref_fa), str(bam), str(out), force=False,
                  omit_intervals=True)
        assert [p.stat().st_mtime_ns for p in parts] == mtimes
        assert summary.read_text() == first
