"""Long-read (minimap-flow analog) path: chaining, piecewise alignment,
prebuilt index, CLI.  Ref: src/workers/Minimap2Worker.cpp:51-106."""
import numpy as np
import pytest

from falcon_genome_tpu.aligner import IndexParams, MinimizerIndex
from falcon_genome_tpu.io.dna import decode_seq, revcomp_codes
from falcon_genome_tpu.io.sam import CIGAR_D, CIGAR_I, CIGAR_M, CIGAR_S
from falcon_genome_tpu.longread import (
    LongReadAligner, LongReadParams, chain_anchors)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(11)
    G = 120_000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    p = LongReadParams()
    idx = MinimizerIndex([("chr1", genome)], p.index)
    return {"rng": rng, "genome": genome, "idx": idx, "params": p,
            "tmp": tmp_path_factory.mktemp("longread")}


def _sim_long_read(rng, genome, pos, L, err=0.05):
    """ONT-ish error profile: ~err/3 each of ins/del/sub."""
    r = genome[pos:pos + L]
    out = []
    i = 0
    while i < len(r):
        u = rng.random()
        if u < err / 3:
            out.append(rng.integers(0, 4))
        elif u < 2 * err / 3:
            i += 1
        elif u < err:
            out.append((r[i] + 1 + rng.integers(0, 3)) % 4)
            i += 1
        else:
            out.append(r[i])
            i += 1
    return np.array(out, np.uint8)


class TestChaining:
    def test_collinear_anchors_chain(self):
        p = LongReadParams()
        q = np.arange(0, 500, 25)
        r = q + 10_000
        chain, score, other = chain_anchors(q, r, 19, p)
        assert len(chain) == len(q)          # all collinear → one chain
        assert score > 19 * 2
        assert other == 0.0

    def test_off_diagonal_outlier_excluded(self):
        p = LongReadParams()
        q = np.array([0, 25, 50, 75, 100, 60])
        r = np.array([0, 25, 50, 75, 100, 90_000]) + 5000
        chain, _, _ = chain_anchors(q, r, 19, p)
        assert len(chain) == 5               # the far-locus anchor drops

    def test_second_locus_scores_as_competitor(self):
        p = LongReadParams()
        # two copies of the same anchor ladder at distant loci
        q = np.tile(np.arange(0, 300, 25), 2)
        r = np.concatenate([np.arange(0, 300, 25) + 1000,
                            np.arange(0, 300, 25) + 50_000])
        chain, score, other = chain_anchors(q, r, 19, p)
        assert other > 0.5 * score           # repeat → strong competitor


class TestLongReadAligner:
    def test_accuracy_at_5pct_error(self, world):
        rng = np.random.default_rng(3)
        genome = world["genome"]
        eng = LongReadAligner(world["idx"], world["params"])
        reads, truth = [], []
        for t in range(16):
            pos = int(rng.integers(0, len(genome) - 6000))
            L = int(rng.integers(1000, 5000))
            r = _sim_long_read(rng, genome, pos, L)
            if t % 2:
                r = revcomp_codes(r)
            reads.append(r)
            truth.append((pos, t % 2 == 1))
        alns = eng.align_batch(reads)
        ok = 0
        for a, (pos, is_rev), r in zip(alns, truth, reads):
            assert a.mapped
            # CIGAR must consume the read exactly
            qcons = sum(n for op, n in a.cigar
                        if op in (CIGAR_M, CIGAR_I, CIGAR_S))
            assert qcons == len(r)
            if a.is_rev == is_rev and abs(a.pos - pos) < 100:
                ok += 1
            assert a.mapq >= 20              # unique placements
        assert ok == len(reads)

    def test_unmappable_read_unmapped(self, world):
        rng = np.random.default_rng(4)
        eng = LongReadAligner(world["idx"], world["params"])
        junk = rng.integers(0, 4, 2000).astype(np.uint8)
        # random sequence: anchors are chance collisions only
        alns = eng.align_batch([junk])
        if alns[0].mapped:                   # tolerated only if weak
            assert alns[0].mapq <= 10

    def test_nm_reflects_error_rate(self, world):
        rng = np.random.default_rng(5)
        genome = world["genome"]
        eng = LongReadAligner(world["idx"], world["params"])
        pos, L = 10_000, 3000
        r = _sim_long_read(rng, genome, pos, L, err=0.05)
        a = eng.align_batch([r])[0]
        assert a.mapped
        # ~5% errors → NM in a sane band (patching can inflate slightly)
        assert 0.01 * L < a.nm < 0.15 * L


class TestPrebuiltIndex:
    def test_mmi_roundtrip(self, world, tmp_path):
        idx = world["idx"]
        p = tmp_path / "ref.mmi.npz"
        idx.save(p)
        back = MinimizerIndex.load(p)
        assert back.params == idx.params
        assert back.contig_names == idx.contig_names
        np.testing.assert_array_equal(back.hashes, idx.hashes)
        np.testing.assert_array_equal(back.positions, idx.positions)
        np.testing.assert_array_equal(back.genome, idx.genome)
        # a loaded index aligns identically
        rng = np.random.default_rng(6)
        r = _sim_long_read(rng, world["genome"], 5000, 2000)
        a1 = LongReadAligner(idx, world["params"]).align_batch([r])[0]
        a2 = LongReadAligner(back, world["params"]).align_batch([r])[0]
        assert (a1.pos, a1.cigar) == (a2.pos, a2.cigar)


class TestLongReadCLI:
    def test_align_long_reads_e2e(self, world, tmp_path):
        from falcon_genome_tpu import cli
        from falcon_genome_tpu.io.bam import read_bam
        from falcon_genome_tpu.io.fasta import write_fasta
        from falcon_genome_tpu.io.fastq import write_fastq

        rng = np.random.default_rng(7)
        genome = world["genome"]
        ref = tmp_path / "ref.fa"
        write_fasta(ref, {"chr1": decode_seq(genome)})
        names, seqs, quals, truth = [], [], [], []
        for t in range(8):
            pos = int(rng.integers(0, len(genome) - 4000))
            L = int(rng.integers(1000, 3000))
            r = _sim_long_read(rng, genome, pos, L)
            names.append(f"lr{t}")
            seqs.append(decode_seq(r))
            quals.append("I" * len(r))
            truth.append(pos)
        fq = tmp_path / "lr.fastq"
        write_fastq(fq, names, seqs, quals)
        out = tmp_path / "lr.bam"
        rc = cli.main(["align", "-r", str(ref), "-1", str(fq),
                       "-o", str(out), "--long-reads", "-f"])
        assert rc == 0
        header, recs = read_bam(str(out))
        by_name = {r.qname: r for r in recs}
        assert len(by_name) == 8
        for t, pos in enumerate(truth):
            rec = by_name[f"lr{t}"]
            assert not rec.is_unmapped
            assert abs(rec.pos - pos) < 100


class TestNativeChaining:
    def test_native_matches_python(self):
        from falcon_genome_tpu.io import native_ext
        if not native_ext.available():
            pytest.skip("native ext unavailable")
        rng = np.random.default_rng(9)
        p = LongReadParams()
        for trial in range(5):
            n = int(rng.integers(5, 400))
            q = np.sort(rng.integers(0, 5000, n)).astype(np.int64)
            r = q + rng.integers(-20, 20, n) + 7777
            r[rng.random(n) < 0.2] = rng.integers(0, 100_000)  # noise
            order = np.lexsort((q, r))
            qs, rs = q[order], r[order].astype(np.int64)
            f, parent, end = native_ext.chain_anchors(
                qs, rs, 19, min(p.lookback, n), p.max_gap)
            # python golden model
            fg = np.full(n, 19.0)
            pg = np.full(n, -1, np.int64)
            L = min(p.lookback, n)
            for i in range(1, n):
                j0 = max(0, i - L)
                dq = qs[i] - qs[j0:i]
                dr = rs[i] - rs[j0:i]
                gap = np.abs(dr - dq)
                ok = (dq > 0) & (dr > 0) & (dq <= p.max_gap) \
                    & (dr <= p.max_gap)
                if not ok.any():
                    continue
                gain = np.minimum(np.minimum(dq, dr), 19).astype(float) \
                    - 0.01 * 19 * gap - 0.5 * np.log2(gap + 1.0)
                cand = np.where(ok, fg[j0:i] + gain, -np.inf)
                b = int(np.argmax(cand))
                if cand[b] > fg[i]:
                    fg[i] = cand[b]
                    pg[i] = j0 + b
            np.testing.assert_allclose(f, fg, rtol=1e-12)
            np.testing.assert_array_equal(parent, pg)
            assert end == int(np.argmax(fg))


class TestLongReadGermline:
    def test_germline_long_reads_e2e(self, world, tmp_path):
        """Fast-germline with the long-read aligner (the reference's
        worker-germline.cpp:191 Minimap2Worker path): planted SNVs must
        come back despite 5% read error."""
        from falcon_genome_tpu import cli
        from falcon_genome_tpu.io.fasta import write_fasta
        from falcon_genome_tpu.io.fastq import write_fastq
        from falcon_genome_tpu.io.vcf import read_vcf

        rng = np.random.default_rng(21)
        G = 60_000
        genome = rng.integers(0, 4, G).astype(np.uint8)
        ref = tmp_path / "ref.fa"
        write_fasta(ref, {"chr1": decode_seq(genome)})
        truth = sorted(int(x) for x in
                       rng.choice(np.arange(2000, G - 2000), 8,
                                  replace=False))
        hap = genome.copy()
        for t in truth:
            hap[t] = (hap[t] + 1) % 4
        names, seqs, quals = [], [], []
        # ~30x coverage of 2kb reads, half hap half ref (het sites)
        for i in range(900):
            pos = int(rng.integers(0, G - 2100))
            src = hap if i % 2 == 0 else genome
            r = _sim_long_read(rng, src, pos, 2000, err=0.05)
            if i % 4 == 1:
                r = revcomp_codes(r)
            names.append(f"g{i}")
            seqs.append(decode_seq(r))
            quals.append("I" * len(r))
        fq = tmp_path / "g.fastq"
        write_fastq(fq, names, seqs, quals)
        out = tmp_path / "g.vcf.gz"
        rc = cli.main(["germline", "-r", str(ref), "-1", str(fq),
                       "-o", str(out), "--long-reads", "-S", "lr",
                       "--produce-vcf", "-f"])
        assert rc == 0
        _, recs = read_vcf(str(out))
        called = {r.pos - 1 for r in recs
                  if r.alts and r.alts[0] not in ("<NON_REF>", ".")}
        found = sum(1 for t in truth if t in called)
        # long-read SNV calling at 5% error: most planted sites recover
        assert found >= len(truth) * 0.7, (found, len(truth))
