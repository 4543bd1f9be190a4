"""Columnar (vectorized) op equivalence vs the object-path golden models:
covariate extraction, ApplyBQSR, duplicate marking, per-base expansion."""
import numpy as np
import pytest

from falcon_genome_tpu.bamops import (
    mark_duplicates, mark_duplicates_columns, unclipped_start)
from falcon_genome_tpu.bqsr import (
    RecalModel, apply_bqsr, apply_bqsr_columns, baserecal_table,
    extract_covariates, extract_covariates_columns)
from falcon_genome_tpu.io.columns import (
    RecordColumns, expand_match_bases, tag_string_values)
from falcon_genome_tpu.io.dna import decode_seq
from falcon_genome_tpu.io.sam import (
    FLAG_DUP, FLAG_REVERSE, FLAG_UNMAPPED, SamRecord, cigar_from_str)


def _sim_records(rng, ref, n=120, read_len=40, with_rg=True):
    """Mapped reads with clips/indels/reverse flags + errors, some dups."""
    recs = []
    cig_choices = [f"{read_len}M", f"5S{read_len-5}M",
                   f"{read_len//2}M3D{read_len - read_len//2}M",
                   f"{read_len//2}M2I{read_len - read_len//2 - 2}M",
                   f"{read_len-4}M4S"]
    for i in range(n):
        pos = int(rng.integers(0, len(ref) - read_len - 10))
        cig = cig_choices[int(rng.integers(0, len(cig_choices)))]
        flag = FLAG_REVERSE if rng.random() < 0.5 else 0
        seq = ref[pos:pos + read_len].copy()
        err = rng.random(read_len) < 0.05
        seq = np.where(err, (seq + 1) % 4, seq)
        qual = (rng.integers(5, 40, read_len) + 33).astype(np.uint8)
        r = SamRecord(f"q{i}", flag, 0, pos, 60, cigar_from_str(cig),
                      seq=decode_seq(seq),
                      qual=qual.tobytes().decode("latin1"))
        if with_rg:
            r.set_tag("RG", "Z", f"rg{i % 2}")
        recs.append(r)
    # duplicates of the first few reads (lower quals)
    for i in range(6):
        src = recs[i]
        d = SamRecord(f"dup{i}", src.flag, 0, src.pos, 60,
                      list(src.cigar), seq=src.seq,
                      qual=chr(20 + 33) * len(src.seq))
        if with_rg:
            d.set_tag("RG", "Z", "rg0")
        recs.append(d)
    return recs


class TestExpandMatchBases:
    def test_matches_python_walk(self, rng):
        ref = rng.integers(0, 4, 500).astype(np.uint8)
        recs = _sim_records(rng, ref, n=40)
        cols = RecordColumns.from_records(recs)
        sel = np.arange(len(recs))
        rec, qpos, rpos = expand_match_bases(cols, sel)
        # golden walk
        from falcon_genome_tpu.io.sam import (
            CIGAR_D, CIGAR_I, CIGAR_M, CIGAR_S)
        gold = []
        for ri, r in enumerate(recs):
            i, rp = 0, r.pos
            for op, nn in r.cigar:
                if op == CIGAR_M:
                    for t in range(nn):
                        gold.append((ri, i + t, rp + t))
                    i += nn
                    rp += nn
                elif op in (CIGAR_I, CIGAR_S):
                    i += nn
                elif op == CIGAR_D:
                    rp += nn
        got = list(zip(rec.tolist(), qpos.tolist(), rpos.tolist()))
        assert got == gold


class TestTagValues:
    def test_rg_roundtrip(self, rng):
        ref = rng.integers(0, 4, 300).astype(np.uint8)
        recs = _sim_records(rng, ref, n=10)
        recs[3].set_tag("NM", "i", 2)   # non-string tag before RG read
        cols = RecordColumns.from_records(recs)
        vals = tag_string_values(cols, b"RG")
        assert vals == [r.get_tag("RG") for r in recs]


class TestCovariatesColumnar:
    def test_matches_object_path(self, rng):
        ref = rng.integers(0, 4, 600).astype(np.uint8)
        recs = _sim_records(rng, ref, n=150)
        # a few ineligible records
        recs.append(SamRecord("u1", FLAG_UNMAPPED))
        recs[10].flag |= FLAG_DUP
        recs[11].flag |= 0x100
        rg_index = {"rg0": 0, "rg1": 1}
        known = {(0, int(p)) for p in rng.integers(0, 600, 25)}
        ref_by_tid = {0: ref}
        gold = extract_covariates(recs, ref_by_tid, known, rg_index)
        cols = RecordColumns.from_records(recs)
        got = extract_covariates_columns(cols, ref_by_tid, known, rg_index)
        assert len(got["rg"]) == len(gold["rg"])
        for k in ("rg", "qual", "cycle", "context", "is_error"):
            np.testing.assert_array_equal(got[k], gold[k], err_msg=k)

    def test_baserecal_table_columnar_equal(self, rng):
        ref = rng.integers(0, 4, 600).astype(np.uint8)
        recs = _sim_records(rng, ref, n=100)
        gold = baserecal_table(recs, {0: ref}, ["rg0", "rg1"])
        cols = RecordColumns.from_records(recs)
        from falcon_genome_tpu.bqsr import accumulate_table
        got = accumulate_table(
            extract_covariates_columns(cols, {0: ref}, None,
                                       {"rg0": 0, "rg1": 1}),
            ["rg0", "rg1"])
        for f in ("qual_obs", "qual_err", "cycle_obs", "cycle_err",
                  "ctx_obs", "ctx_err"):
            np.testing.assert_allclose(getattr(got, f), getattr(gold, f),
                                       err_msg=f)


class TestApplyBqsrColumnar:
    def test_matches_object_path(self, rng):
        ref = rng.integers(0, 4, 600).astype(np.uint8)
        recs = _sim_records(rng, ref, n=120)
        rg_index = {"rg0": 0, "rg1": 1}
        table = baserecal_table(recs, {0: ref}, ["rg0", "rg1"])
        model = RecalModel.fit(table)
        cols = RecordColumns.from_records(recs)
        apply_bqsr_columns(cols, model, rg_index)
        gold = apply_bqsr([r for r in recs], model, rg_index)
        out = cols.to_records()
        for g, o in zip(gold, out):
            assert g.qual == o.qual, g.qname


class TestMarkdupColumnar:
    def _compare(self, recs):
        import copy
        gold_recs = copy.deepcopy(recs)
        _, gold_ndup = mark_duplicates(gold_recs)
        cols = RecordColumns.from_records(recs)
        _, ndup = mark_duplicates_columns(cols)
        assert ndup == gold_ndup
        got = cols.to_records()
        for g, o in zip(gold_recs, got):
            assert g.is_duplicate == o.is_duplicate, g.qname

    def test_fragments_and_pairs(self, rng):
        ref = rng.integers(0, 4, 600).astype(np.uint8)
        recs = _sim_records(rng, ref, n=80)

        def pair(name, p1, p2, qual="I" * 10):
            r1 = SamRecord(name, 0x1 | 0x40, 0, p1, 60,
                           cigar_from_str("10M"), seq="A" * 10, qual=qual)
            r2 = SamRecord(name, 0x1 | 0x80 | FLAG_REVERSE, 0, p2, 60,
                           cigar_from_str("10M"), seq="A" * 10, qual=qual)
            return [r1, r2]
        recs += pair("p1", 100, 300) + pair("p2", 100, 300, "5" * 10) \
            + pair("p3", 100, 400)
        self._compare(recs)

    def test_clip_aware_and_ties(self, rng):
        recs = [
            SamRecord("b", 0, 0, 100, 60, cigar_from_str("10M"),
                      seq="A" * 10, qual="I" * 10),
            SamRecord("a", 0, 0, 103, 60, cigar_from_str("3S7M"),
                      seq="A" * 10, qual="I" * 10),  # same unclipped start
            SamRecord("c", 0, 0, 200, 60, cigar_from_str("10M"),
                      seq="A" * 10, qual="I" * 10),
        ]
        self._compare(recs)

    def test_secondary_marked_with_primary(self, rng):
        recs = [
            SamRecord("x", 0, 0, 100, 60, cigar_from_str("10M"),
                      seq="A" * 10, qual="I" * 10),
            SamRecord("y", 0, 0, 100, 60, cigar_from_str("10M"),
                      seq="A" * 10, qual="#" * 10),
            SamRecord("y", 0x100, 0, 250, 60, cigar_from_str("10M"),
                      seq="A" * 10, qual="#" * 10),
        ]
        self._compare(recs)

    def test_unclipped_start_agrees(self, rng):
        recs = [
            SamRecord("f", 0, 0, 100, 60, cigar_from_str("5S5M"),
                      seq="A" * 10, qual="I" * 10),
            SamRecord("r", FLAG_REVERSE, 0, 100, 60,
                      cigar_from_str("5M5S"), seq="A" * 10, qual="I" * 10),
            SamRecord("hs", 0, 0, 50, 60, cigar_from_str("2H3S5M"),
                      seq="A" * 8, qual="I" * 8),
        ]
        cols = RecordColumns.from_records(recs)
        from falcon_genome_tpu.bamops import _unclipped_coords_columns
        uc, rev = _unclipped_coords_columns(cols, np.arange(3))
        assert uc.tolist() == [unclipped_start(r) for r in recs]


class TestOpticalDuplicates:
    """Picard MarkDuplicates optical-duplicate semantics: same duplicate
    set + same flowcell/lane prefix + same tile + pixel distance ≤ 100."""

    def _pair(self, name, p1=100, p2=300, qual="I" * 10):
        r1 = SamRecord(name, 0x1 | 0x40, 0, p1, 60,
                       cigar_from_str("10M"), seq="A" * 10, qual=qual)
        r2 = SamRecord(name, 0x1 | 0x80 | FLAG_REVERSE, 0, p2, 60,
                       cigar_from_str("10M"), seq="A" * 10, qual=qual)
        return [r1, r2]

    def _run(self, recs):
        from falcon_genome_tpu.bamops import mark_duplicates_columns
        cols = RecordColumns.from_records(recs)
        _, ndup, m = mark_duplicates_columns(cols, return_metrics=True)
        return ndup, m

    def test_close_on_tile_is_optical(self):
        recs = (self._pair("M1:5:FC:1:2101:1000:2000", qual="I" * 10)
                + self._pair("M1:5:FC:1:2101:1050:2050", qual="5" * 10))
        ndup, m = self._run(recs)
        assert ndup == 2                     # one dup pair (both mates)
        assert m.pair_duplicates == 1
        assert m.optical_duplicates == 1

    def test_far_apart_not_optical(self):
        recs = (self._pair("M1:5:FC:1:2101:1000:2000", qual="I" * 10)
                + self._pair("M1:5:FC:1:2101:9000:9000", qual="5" * 10))
        ndup, m = self._run(recs)
        assert m.pair_duplicates == 1
        assert m.optical_duplicates == 0

    def test_different_tile_not_optical(self):
        recs = (self._pair("M1:5:FC:1:2101:1000:2000", qual="I" * 10)
                + self._pair("M1:5:FC:1:2102:1000:2000", qual="5" * 10))
        _, m = self._run(recs)
        assert m.pair_duplicates == 1
        assert m.optical_duplicates == 0

    def test_unparseable_names_never_optical(self):
        recs = (self._pair("alpha", qual="I" * 10)
                + self._pair("beta", qual="5" * 10))
        _, m = self._run(recs)
        assert m.pair_duplicates == 1
        assert m.optical_duplicates == 0

    def test_metrics_counts_and_library_size(self):
        # 3 distinct pairs + 1 PCR dup of the first → 4 examined, 1 dup
        recs = (self._pair("M1:5:FC:1:2101:1000:2000", qual="I" * 10)
                + self._pair("M1:5:FC:1:2102:5000:6000", qual="5" * 10)
                + self._pair("u1", 500, 700) + self._pair("u2", 900, 1100))
        ndup, m = self._run(recs)
        assert m.pairs_examined == 4
        assert m.pair_duplicates == 1
        assert m.unpaired_examined == 0
        assert m.estimated_library_size is not None
        assert m.estimated_library_size >= 3

    def test_flag_marking_unchanged_by_metrics(self, rng):
        # optical detection must not change which records get FLAG_DUP
        import copy
        recs = (self._pair("M1:5:FC:1:2101:1000:2000", qual="I" * 10)
                + self._pair("M1:5:FC:1:2101:1050:2050", qual="5" * 10))
        from falcon_genome_tpu.bamops import mark_duplicates_columns
        cols_a = RecordColumns.from_records(copy.deepcopy(recs))
        cols_b = RecordColumns.from_records(recs)
        a, na = mark_duplicates_columns(cols_a)
        b, nb, _ = mark_duplicates_columns(cols_b, return_metrics=True)
        assert na == nb
        np.testing.assert_array_equal(a.fixed, b.fixed)


class TestBucketFolderRegionPruning:
    """BamInput's per-bucket region merge (src/BamInput.cpp:73-149): a
    bucket-folder input with .list sidecars decodes only the parts whose
    regions intersect the requested shard."""

    def _make_parts(self, tmp_path, rng):
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.intervals import (
            Interval, write_interval_list)
        from falcon_genome_tpu.io.sam import SamHeader
        header = SamHeader(contigs=[("chr1", 100_000)])
        d = tmp_path / "buckets"
        d.mkdir()
        spans = [(1, 30_000), (30_001, 60_000), (60_001, 100_000)]
        for bi, (s, e) in enumerate(spans):
            recs = []
            for i in range(20):
                pos = int(rng.integers(s - 1, e - 200))
                recs.append(SamRecord(f"b{bi}r{i}", 0, 0, pos, 60,
                                      cigar_from_str("10M"),
                                      seq="A" * 10, qual="I" * 10))
            recs.sort(key=lambda r: r.pos)
            write_bam(d / f"part-{bi:06d}.bam", header, recs)
            write_interval_list(d / f"part-{bi:06d}.list",
                                [Interval("chr1", s, e)])
        return d, header

    def test_prunes_to_intersecting_parts(self, tmp_path, rng, monkeypatch):
        from falcon_genome_tpu.io.intervals import Interval
        from falcon_genome_tpu.stages import bamstages
        d, header = self._make_parts(tmp_path, rng)
        src = bamstages.BamInputSource(str(d), stream_threshold_bytes=0)
        assert src.parts is not None          # pruned-streaming mode
        calls = []
        real = bamstages.read_bam_columns

        def counting(path, *a, **kw):
            calls.append(str(path))
            return real(path, *a, **kw)
        monkeypatch.setattr(bamstages, "read_bam_columns", counting)
        shard = [Interval("chr1", 35_000, 40_000)]
        cols = src.columns_for(shard)
        assert len(calls) == 1                # only the middle bucket
        assert calls[0].endswith("part-000001.bam")
        f = cols.fixed
        from falcon_genome_tpu.io.columns import F_POS
        assert len(cols) > 0
        assert (f[:, F_POS] >= 34_000).all()
        assert (f[:, F_POS] < 40_000).all()

    def test_matches_whole_folder_path(self, tmp_path, rng):
        from falcon_genome_tpu.io.intervals import Interval
        from falcon_genome_tpu.stages.bamstages import BamInputSource
        d, header = self._make_parts(tmp_path, rng)
        pruned = BamInputSource(str(d), stream_threshold_bytes=0)
        whole = BamInputSource(str(d), stream_threshold_bytes=1 << 40)
        assert pruned.parts is not None and whole.parts is None
        shard = [Interval("chr1", 25_000, 65_000)]  # spans all 3 buckets
        a = pruned.columns_for(shard)
        b = whole.columns_for(shard)
        # same record multiset (order may differ across bucket concat)
        ka = sorted(map(tuple, a.fixed.tolist()))
        kb = sorted(map(tuple, b.fixed.tolist()))
        assert ka == kb
