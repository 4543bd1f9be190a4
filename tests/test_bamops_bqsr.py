"""Sort / markdup (sambamba-action replacements) and BQSR tests."""
import numpy as np
import pytest

from falcon_genome_tpu.bamops import (
    mark_duplicates, merge_sorted, sort_records, unclipped_start)
from falcon_genome_tpu.bqsr import (
    MAX_QUAL, RecalModel, RecalTable, accumulate_table, apply_bqsr,
    baserecal_table, extract_covariates)
from falcon_genome_tpu.io.dna import decode_seq
from falcon_genome_tpu.io.sam import (
    FLAG_DUP, FLAG_REVERSE, FLAG_UNMAPPED, SamRecord, cigar_from_str)


def rec(name, tid, pos, cigar="10M", flag=0, qual="I" * 10, seq="A" * 10):
    return SamRecord(name, flag, tid, pos, 60, cigar_from_str(cigar),
                     seq=seq, qual=qual)


class TestSort:
    def test_coordinate_sort(self):
        rs = [rec("a", 1, 5), rec("b", 0, 100), rec("c", 0, 7),
              SamRecord("u", FLAG_UNMAPPED), rec("d", 1, 2)]
        out = sort_records(rs)
        assert [r.qname for r in out] == ["c", "b", "d", "a", "u"]

    def test_merge_sorted(self):
        s1 = [rec("a", 0, 1), rec("b", 0, 50)]
        s2 = [rec("c", 0, 20), rec("d", 1, 3)]
        out = merge_sorted([s1, s2])
        assert [r.qname for r in out] == ["a", "c", "b", "d"]


class TestUnclippedStart:
    def test_forward_clip(self):
        r = rec("x", 0, 100, cigar="5S5M", qual="I" * 10)
        assert unclipped_start(r) == 95

    def test_reverse_clip(self):
        r = rec("x", 0, 100, cigar="5M5S", flag=FLAG_REVERSE)
        # end = 105, plus 5 trailing clip, minus 1
        assert unclipped_start(r) == 109


class TestMarkdup:
    def test_identical_fragments_marked(self):
        rs = [rec("r1", 0, 100, qual="I" * 10),
              rec("r2", 0, 100, qual="5" * 10),  # lower qual → dup
              rec("r3", 0, 200)]
        out, ndup = mark_duplicates(rs)
        assert ndup == 1
        assert not out[0].is_duplicate
        assert out[1].is_duplicate
        assert not out[2].is_duplicate

    def test_clip_aware_duplicates(self):
        # same unclipped start although different pos
        rs = [rec("a", 0, 100, cigar="10M"),
              rec("b", 0, 103, cigar="3S7M", qual="#" * 10)]
        out, ndup = mark_duplicates(rs)
        assert ndup == 1
        assert out[1].is_duplicate

    def test_pairs_keyed_by_both_ends(self):
        def pair(name, p1, p2, qual="I" * 10):
            r1 = rec(name, 0, p1, flag=0x1 | 0x40, qual=qual)
            r2 = rec(name, 0, p2, flag=0x1 | 0x80 | FLAG_REVERSE, qual=qual)
            return [r1, r2]
        rs = pair("p1", 100, 300) + pair("p2", 100, 300, qual="5" * 10) + \
            pair("p3", 100, 400)
        out, ndup = mark_duplicates(rs)
        dups = {r.qname for r in out if r.is_duplicate}
        assert dups == {"p2"}

    def test_deterministic_tiebreak(self):
        rs = [rec("b", 0, 100), rec("a", 0, 100)]  # equal quality
        out, _ = mark_duplicates(rs)
        kept = {r.qname for r in out if not r.is_duplicate}
        assert kept == {"a"}  # lexicographically first kept


class TestBQSR:
    def _setup(self, rng, n_reads=200, err_rate=0.05, qual=30):
        ref = rng.integers(0, 4, 2000).astype(np.uint8)
        records = []
        for i in range(n_reads):
            pos = rng.integers(0, 1900)
            seq = ref[pos:pos + 50].copy()
            for t in range(50):
                if rng.random() < err_rate:
                    seq[t] = (seq[t] + rng.integers(1, 4)) % 4
            r = SamRecord(f"r{i}", 0, 0, int(pos), 60,
                          cigar_from_str("50M"),
                          seq=decode_seq(seq), qual=chr(qual + 33) * 50)
            r.set_tag("RG", "Z", "rg0")
            records.append(r)
        return ref, records

    def test_histogram_counts(self, rng):
        ref, records = self._setup(rng, n_reads=50, err_rate=0.0)
        table = baserecal_table(records, {0: ref}, ["rg0"])
        assert table.qual_obs.sum() == 50 * 50
        assert table.qual_err.sum() == 0
        assert table.qual_obs[0, 30] == 2500

    def test_errors_counted(self, rng):
        ref, records = self._setup(rng, n_reads=100, err_rate=0.1)
        table = baserecal_table(records, {0: ref}, ["rg0"])
        err_frac = table.qual_err.sum() / table.qual_obs.sum()
        # 10% mutations, 1/3 of "mutations" may hit same base? no:
        # rng.integers(1,4) never yields 0 shift → all are real errors
        assert 0.06 < err_frac < 0.14

    def test_known_sites_masked(self, rng):
        ref, records = self._setup(rng, n_reads=20, err_rate=0.0)
        known = {(0, p) for p in range(2000)}
        table = baserecal_table(records, {0: ref}, ["rg0"], known)
        assert table.qual_obs.sum() == 0

    def test_gather_is_addition(self, rng):
        ref, records = self._setup(rng, n_reads=40)
        t_all = baserecal_table(records, {0: ref}, ["rg0"])
        t1 = baserecal_table(records[:20], {0: ref}, ["rg0"])
        t2 = baserecal_table(records[20:], {0: ref}, ["rg0"])
        merged = t1 + t2
        np.testing.assert_allclose(merged.qual_obs, t_all.qual_obs)
        np.testing.assert_allclose(merged.cycle_err, t_all.cycle_err)

    def test_recalibration_direction(self, rng):
        # reported q30 (error 1e-3) but actual error rate 10% → quals drop
        ref, records = self._setup(rng, n_reads=200, err_rate=0.1, qual=30)
        table = baserecal_table(records, {0: ref}, ["rg0"])
        model = RecalModel.fit(table)
        out = apply_bqsr([records[0]], model, {"rg0": 0})
        new_quals = np.frombuffer(out[0].qual.encode(), np.uint8) - 33
        assert new_quals.mean() < 20  # pulled toward ~10 (true error 10%)

    def test_recalibration_consistent_when_accurate(self, rng):
        # reported q20 (1e-2) and actual 1% → quals stay near 20
        ref, records = self._setup(rng, n_reads=400, err_rate=0.01, qual=20)
        table = baserecal_table(records, {0: ref}, ["rg0"])
        model = RecalModel.fit(table)
        out = apply_bqsr([records[0]], model, {"rg0": 0})
        new_quals = np.frombuffer(out[0].qual.encode(), np.uint8) - 33
        assert 17 <= new_quals.mean() <= 23

    def test_table_roundtrip(self, rng, tmp_path):
        ref, records = self._setup(rng, n_reads=10)
        t = baserecal_table(records, {0: ref}, ["rg0"])
        p = str(tmp_path / "recal.npz")
        t.save(p)
        t2 = RecalTable.load(p)
        np.testing.assert_allclose(t.qual_obs, t2.qual_obs)
        assert t2.read_groups == ["rg0"]


class TestNativeBqsrHist:
    def test_native_matches_python_tables(self):
        """fg_bqsr_hist one-pass histograms == the numpy extraction +
        accumulation, on adversarial data: soft clips, indels, reverse
        strand, excluded flags, sub-threshold and above-range quals,
        known sites, two read groups."""
        from falcon_genome_tpu.bqsr import (accumulate_table,
                                            baserecal_shard_table,
                                            extract_covariates_columns)
        from falcon_genome_tpu.io import native_ext
        from falcon_genome_tpu.io.columns import RecordColumns
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.sam import SamRecord, cigar_from_str
        if not native_ext.available():
            pytest.skip("native ext required")
        rng = np.random.default_rng(11)
        ref = rng.integers(0, 4, 5000).astype(np.uint8)
        recs = []
        for i in range(300):
            pos = int(rng.integers(0, 4800))
            L = int(rng.integers(30, 120))
            cig = f"{L}M"
            r0 = rng.random()
            if r0 < 0.3:
                a, b = int(rng.integers(1, 10)), int(rng.integers(1, 10))
                m1 = max(5, (L - a - b) // 2)
                m2 = L - a - b - m1
                if m2 > 2:
                    cig = (f"{a}S{m1}M{b}I{m2 - 1}M" if r0 < 0.15
                           else f"{a}S{m1}M{b}D{m2}M")
            qlen = sum(n for op, n in cigar_from_str(cig)
                       if op in (0, 1, 4, 7, 8))
            seq = ref[pos:pos + qlen].copy()
            mut = rng.random(len(seq)) < 0.1
            seq = np.where(mut, (seq + 1) % 4, seq)
            q = rng.integers(2, 95, qlen)
            flag = 0x10 if rng.random() < 0.5 else 0
            if rng.random() < 0.1:
                flag |= 0x400
            rec = SamRecord(
                f"r{i}", flag, 0, pos, 60, cigar_from_str(cig),
                seq=decode_seq(seq),
                qual="".join(chr(int(x) + 33) for x in q))
            rec.set_tag("RG", "Z", "rgA" if i % 3 else "rgB")
            recs.append(rec)
        cols = RecordColumns.from_records(recs)
        ref_by_tid = {0: ref}
        known = {0: np.sort(rng.choice(5000, 200,
                                       replace=False)).astype(np.int64)}
        rgi = {"rgA": 0, "rgB": 1}
        rgs = ["rgA", "rgB"]
        tn = baserecal_shard_table(cols, ref_by_tid, known, rgi, rgs)
        tp = accumulate_table(
            extract_covariates_columns(cols, ref_by_tid, known, rgi),
            rgs)
        for name in ("qual_obs", "qual_err", "cycle_obs", "cycle_err",
                     "ctx_obs", "ctx_err"):
            assert np.array_equal(getattr(tn, name), getattr(tp, name)), \
                name
        assert tn.qual_obs.sum() > 0

    def test_native_apply_matches_python(self, monkeypatch):
        """fg_bqsr_apply (lookup-table rewrite) == the numpy remap,
        including preserve_qscores_less_than and reverse-strand cycles."""
        import falcon_genome_tpu.io.native_ext as ne
        from falcon_genome_tpu.bqsr import (RecalModel,
                                            apply_bqsr_columns,
                                            baserecal_shard_table)
        from falcon_genome_tpu.io.columns import RecordColumns
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.sam import SamRecord, cigar_from_str
        if not ne.available():
            pytest.skip("native ext required")
        rng = np.random.default_rng(3)
        ref = rng.integers(0, 4, 4000).astype(np.uint8)
        recs = []
        for i in range(200):
            pos = int(rng.integers(0, 3800))
            L = int(rng.integers(20, 150))
            seq = ref[pos:pos + L].copy()
            seq = np.where(rng.random(L) < 0.08, (seq + 1) % 4, seq)
            q = rng.integers(2, 95, L)
            r = SamRecord(
                f"r{i}", 0x10 * (i % 2), 0, pos, 60,
                cigar_from_str(f"{L}M"), seq=decode_seq(seq),
                qual="".join(chr(int(x) + 33) for x in q))
            r.set_tag("RG", "Z", "rgA" if i % 2 else "rgB")
            recs.append(r)
        rgi = {"rgA": 0, "rgB": 1}
        cols = RecordColumns.from_records(recs)
        model = RecalModel.fit(baserecal_shard_table(
            cols, {0: ref}, None, rgi, ["rgA", "rgB"]))
        for pb in (None, 20):
            a1 = apply_bqsr_columns(RecordColumns.from_records(recs),
                                    model, rgi, preserve_below=pb)
            monkeypatch.setattr(ne, "load", lambda: None)
            a2 = apply_bqsr_columns(RecordColumns.from_records(recs),
                                    model, rgi, preserve_below=pb)
            monkeypatch.undo()
            assert np.array_equal(a1.qual, a2.qual)
