"""Columnar record path: native encode/scan round trips, vectorized BAI,
threaded BGZF, and alignments_to_columns equivalence vs make_sam_records."""
import random

import numpy as np
import pytest

from falcon_genome_tpu.aligner import (
    Alignment, AlignerParams, alignments_to_columns, make_sam_records)
from falcon_genome_tpu.io import native_ext
from falcon_genome_tpu.io.bam import (
    read_bam, write_bam, write_bam_columns)
from falcon_genome_tpu.io.columns import RecordColumns
from falcon_genome_tpu.io.dna import decode_seq
from falcon_genome_tpu.io.fastq import FastqBatch
from falcon_genome_tpu.io.sam import SamHeader, SamRecord


@pytest.fixture
def header():
    return SamHeader(contigs=[("chr1", 100000), ("chr2", 50000)])


def _random_records(n=300, seed=11):
    random.seed(seed)
    rng = np.random.default_rng(seed)
    recs = []
    for i, p in enumerate(sorted(rng.integers(0, 90000, n).tolist())):
        L = int(rng.integers(40, 151))
        seq = "".join(random.choice("ACGTN") for _ in range(L))
        qual = "".join(chr(33 + random.randint(0, 60)) for _ in range(L))
        cig = [(0, L)] if i % 3 else [(4, 5), (0, L - 5)]
        r = SamRecord(f"r{i:05d}", flag=(16 if i % 2 else 0),
                      tid=i % 2, pos=p, mapq=int(rng.integers(0, 61)),
                      cigar=cig, mtid=0, mpos=p + 100, tlen=200,
                      seq=seq, qual=qual)
        r.set_tag("NM", "i", int(rng.integers(0, 300)))
        r.set_tag("RG", "Z", "rg0")
        recs.append(r)
    recs.sort(key=lambda r: (r.tid, r.pos))
    for i in range(4):
        recs.append(SamRecord(f"u{i}", flag=4, seq="ACGT", qual="IIII"))
    return recs


def test_write_bam_columns_matches_record_path(tmp_path, header):
    recs = _random_records()
    p_old = tmp_path / "old.bam"
    p_new = tmp_path / "new.bam"
    write_bam(p_old, header, recs)
    write_bam_columns(p_new, header, RecordColumns.from_records(recs))
    _, r1 = read_bam(p_old)
    _, r2 = read_bam(p_new)
    assert r1 == r2
    # vectorized BAI must be byte-identical to the record-path BAI
    assert (p_old.with_suffix(".bam.bai").read_bytes()
            == p_new.with_suffix(".bam.bai").read_bytes())


def test_columns_scan_roundtrip(tmp_path, header):
    if not native_ext.available():
        pytest.skip("native fgio unavailable")
    recs = _random_records(seed=5)
    p1 = tmp_path / "a.bam"
    write_bam(p1, header, recs)
    from falcon_genome_tpu.io.bam import BamReader
    with BamReader(p1) as r:
        blob = r._r.read(-1)
    cols = RecordColumns.from_scan(blob)
    assert cols.to_records() == recs
    p2 = tmp_path / "b.bam"
    write_bam_columns(p2, header, cols)
    _, r2 = read_bam(p2)
    assert r2 == recs


def test_columns_permutation_and_take(tmp_path, header):
    recs = _random_records(seed=9)
    cols = RecordColumns.from_records(recs)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(recs))
    p = tmp_path / "perm.bam"
    write_bam_columns(p, header, cols, order=perm, index=False)
    _, out = read_bam(p)
    assert out == [recs[i] for i in perm]
    sub = cols.take(perm[:50])
    assert sub.to_records() == [recs[i] for i in perm[:50]]


def test_columns_concat(header):
    recs = _random_records(seed=13)
    a = RecordColumns.from_records(recs[:100])
    b = RecordColumns.from_records(recs[100:])
    assert RecordColumns.concat([a, b]).to_records() == recs


def test_bgzf_compress_mt_matches_serial():
    if not native_ext.available():
        pytest.skip("native fgio unavailable")
    rng = np.random.default_rng(2)
    data = rng.integers(0, 255, 400000, dtype=np.uint8).tobytes()
    serial = native_ext.bgzf_compress(data)
    mt, coffs = native_ext.bgzf_compress_mt(data, nthreads=4)
    assert mt == serial
    # block offsets index the compressed stream at 65280-byte pitch
    assert coffs[0] == 0 and coffs[-1] == len(mt)
    assert len(coffs) == (len(data) + 65279) // 65280 + 1


def test_name_hashes_native_matches_python():
    recs = _random_records(seed=21)[:40]
    cols = RecordColumns.from_records(recs)
    h = cols.name_hashes()
    # python twin
    import falcon_genome_tpu.io.native_ext as ne
    saved, ne._lib, ne._tried = ne._lib, None, True
    try:
        hp = cols.name_hashes()
    finally:
        ne._lib, ne._tried = saved, True
    assert np.array_equal(h, hp)
    assert len(np.unique(h)) == len(np.unique([r.qname for r in recs]))


def _mk_batch(B, L, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 5, (B, L)).astype(np.uint8)
    quals = rng.integers(2, 41, (B, L)).astype(np.uint8)
    lengths = rng.integers(L // 2, L + 1, B).astype(np.int32)
    for i in range(B):
        codes[i, lengths[i]:] = 4
        quals[i, lengths[i]:] = 0
    return FastqBatch([f"q{i:05d}" for i in range(B)], codes, quals,
                      lengths)


def _mk_aln(L, rng):
    if rng.random() < 0.2:
        return Alignment(mapped=False, read_len=L)
    sc = int(rng.integers(20, 150))
    roll = rng.random()
    if roll < 0.3:
        cig = [(4, 3), (0, L - 3)]
    elif roll < 0.5:
        cig = [(0, L // 2), (1, 2), (0, L - L // 2 - 2)]
    else:
        cig = [(0, L)]
    return Alignment(
        mapped=True, tid=int(rng.integers(0, 2)),
        pos=int(rng.integers(0, 10000)), is_rev=bool(rng.random() < 0.5),
        score=sc, sub_score=int(rng.integers(0, sc)),
        mapq=int(rng.integers(0, 61)), cigar=cig,
        nm=int(rng.integers(0, 10)), read_len=L)


@pytest.mark.parametrize("paired", [False, True])
def test_alignments_to_columns_matches_make_sam_records(paired):
    rng = np.random.default_rng(31)
    params = AlignerParams()
    B, L = 120, 100
    b1 = _mk_batch(B, L, 1)
    b2 = _mk_batch(B, L, 2) if paired else None
    res1 = [_mk_aln(int(b1.lengths[i]), rng) for i in range(B)]
    res2 = ([_mk_aln(int(b2.lengths[i]), rng) for i in range(B)]
            if paired else None)

    expected = []
    for i in range(B):
        s1 = decode_seq(b1.codes[i, :b1.lengths[i]])
        q1 = (b1.quals[i, :b1.lengths[i]] + 33).tobytes().decode()
        if paired:
            s2 = decode_seq(b2.codes[i, :b2.lengths[i]])
            q2 = (b2.quals[i, :b2.lengths[i]] + 33).tobytes().decode()
            expected.extend(make_sam_records(
                b1.names[i], s1, q1, res1[i], s2, q2, res2[i],
                params=params, read_group="rgX"))
        else:
            expected.extend(make_sam_records(
                b1.names[i], s1, q1, res1[i], params=params,
                read_group="rgX"))
    cols = alignments_to_columns(b1, res1, b2, res2, params=params,
                                 read_group="rgX")
    assert cols.to_records() == expected
    assert np.array_equal(
        cols.coordinate_order(),
        np.lexsort(([r.pos for r in expected],
                    [(1 << 30) if r.is_unmapped else r.tid
                     for r in expected])))
