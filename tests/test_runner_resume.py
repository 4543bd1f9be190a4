"""Runner observability + resume: per-task log files, find_error wiring,
stage skip on existing outputs, jax.profiler traces via tpu.profile."""
import os
import time
from pathlib import Path

import pytest

from falcon_genome_tpu.config import Config, Machine
from falcon_genome_tpu.pipeline.runner import (
    PipelineRunner, StageError, stage)


class TestTaskLogsAndFindError:
    def test_failed_task_writes_log_and_diagnosis(self, tmp_path):
        def boom():
            raise ValueError("the operative problem")
        runner = PipelineRunner("T", log_dir=str(tmp_path / "logs"))
        with pytest.raises(StageError) as ei:
            runner.run([stage("S", [boom, boom])])
        msg = str(ei.value)
        assert "the operative problem" in msg     # scraped via find_error
        assert "task logs:" in msg
        logs = list((tmp_path / "logs").glob("T-S-*.log.*"))
        assert len(logs) >= 1
        assert "Traceback" in logs[0].read_text()

    def test_diagnosis_deduped_across_shards(self, tmp_path):
        def boom():
            raise RuntimeError("same everywhere")
        runner = PipelineRunner("T", log_dir=str(tmp_path / "logs"))
        with pytest.raises(StageError) as ei:
            runner.run([stage("S", [boom] * 4, nprocs=2)])
        # one diagnosis, not 4 copies
        assert str(ei.value).count("same everywhere") == 1


class TestResume:
    def test_skip_returns_outputs(self, tmp_path):
        outs = [str(tmp_path / f"part-{i}.txt") for i in range(3)]
        calls = []

        def mk(i):
            def fn():
                calls.append(i)
                Path(outs[i]).write_text("x")
                return outs[i]
            return fn
        runner = PipelineRunner("T", force=False)
        r1 = runner.run([stage("S", [mk(i) for i in range(3)],
                               outputs=outs)])["S"]
        assert r1 == outs and calls == [0, 1, 2]
        calls.clear()
        r2 = runner.run([stage("S", [mk(i) for i in range(3)],
                               outputs=outs)])["S"]
        assert r2 == outs and calls == []         # skipped, outputs handed

    def test_partial_outputs_rerun(self, tmp_path):
        """Task-granular resume: only tasks whose declared output is
        missing re-run (a killed scatter resumes at shard granularity,
        like the reference's per-contig BQSR artifacts)."""
        outs = [str(tmp_path / f"p{i}") for i in range(2)]
        Path(outs[0]).write_text("x")             # only one exists
        calls = []

        def mk(i):
            def fn():
                calls.append(i)
                Path(outs[i]).write_text("x")
                return outs[i]
            return fn
        r = PipelineRunner("T").run(
            [stage("S", [mk(0), mk(1)], outputs=outs)])["S"]
        assert calls == [1]                       # 0 resumed from artifact
        assert r == outs                          # both paths handed back

    def test_force_reruns(self, tmp_path):
        outs = [str(tmp_path / "p0")]
        Path(outs[0]).write_text("x")
        calls = []
        PipelineRunner("T", force=True).run(
            [stage("S", [lambda: calls.append(0)], outputs=outs)])
        assert calls == [0]

    def test_htc_resume_reuses_parts(self, tmp_path, rng):
        """Second htc run without -f reuses the per-shard parts."""
        import sys
        sys.path.insert(0, str(Path(__file__).parent.parent))
        import numpy as np
        import __graft_entry__ as ge
        from falcon_genome_tpu import stages
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.fasta import write_fasta
        from falcon_genome_tpu.io.sam import SamHeader
        from falcon_genome_tpu.io.vcf import read_vcf

        ref, records = ge._simulated_germline_records(
            np.random.default_rng(5))
        ref_fa = tmp_path / "r.fa"
        write_fasta(ref_fa, {"chr1": decode_seq(ref)})
        bam = tmp_path / "in.bam"
        write_bam(bam, SamHeader(contigs=[("chr1", len(ref))]), records)
        conf = Config(machine=Machine(8, 16), environ={},
                      load_files=False)
        conf.set("gatk.ncontigs", 2)
        out = tmp_path / "calls.vcf"
        stages.run_htc(conf, str(ref_fa), str(bam), str(out),
                       produce_vcf=True, force=True)
        _, first = read_vcf(str(out))
        parts = sorted((tmp_path / "calls.vcf.parts").glob("part-*"))
        assert parts
        mtimes = [p.stat().st_mtime_ns for p in parts]
        os.remove(out)
        time.sleep(0.02)
        stages.run_htc(conf, str(ref_fa), str(bam), str(out),
                       produce_vcf=True, force=False)
        assert [p.stat().st_mtime_ns for p in parts] == mtimes  # reused
        _, second = read_vcf(str(out))
        assert [(r.pos, r.ref, tuple(r.alts)) for r in first] == \
            [(r.pos, r.ref, tuple(r.alts)) for r in second]
        # with -f the parts regenerate
        stages.run_htc(conf, str(ref_fa), str(bam), str(out),
                       produce_vcf=True, force=True)
        assert [p.stat().st_mtime_ns for p in parts] != mtimes


class TestProfile:
    def test_tpu_profile_emits_trace(self, tmp_path):
        conf = Config(machine=Machine(8, 16), environ={},
                      load_files=False)
        conf.set("tpu.profile", True)
        conf.set("log_dir", str(tmp_path / "log"))
        runner = PipelineRunner.from_conf("T", conf)
        assert runner.profile_dir is not None

        def work():
            import jax.numpy as jnp
            return float(jnp.arange(8).sum())
        runner.run([stage("S", [work])])
        prof = Path(runner.profile_dir)
        assert prof.exists() and any(prof.rglob("*"))

    def test_profile_off_by_default(self, tmp_path):
        conf = Config(machine=Machine(8, 16), environ={},
                      load_files=False)
        assert PipelineRunner.from_conf("T", conf).profile_dir is None


class TestBaserecalShardResume:
    """Kill-and-rerun: a baserecal scatter that dies mid-run resumes
    from its surviving part-%06d.recal.npz tables and produces the same
    final table as an uninterrupted run (the reference persists
    per-contig BQSR tables the same way, BQSRWorker.cpp:111-150)."""

    def test_kill_and_rerun(self, tmp_path, monkeypatch):
        import numpy as np

        import falcon_genome_tpu.stages.bqsr as sbq
        from falcon_genome_tpu.bqsr import RecalTable
        from falcon_genome_tpu.config import Config, Machine
        from falcon_genome_tpu.io.bam import write_bam
        from falcon_genome_tpu.io.dna import decode_seq
        from falcon_genome_tpu.io.fasta import write_fasta
        from falcon_genome_tpu.io.sam import (SamHeader, SamRecord,
                                              cigar_from_str)

        rng = np.random.default_rng(5)
        ref = rng.integers(0, 4, 4000).astype(np.uint8)
        ref_fa = tmp_path / "ref.fa"
        write_fasta(ref_fa, {"chr1": decode_seq(ref)})
        header = SamHeader(contigs=[("chr1", len(ref))],
                           read_groups=[{"ID": "rgA", "SM": "s"}])
        recs = []
        for i in range(120):
            pos = int(rng.integers(0, len(ref) - 60))
            seq = ref[pos:pos + 60].copy()
            err = rng.random(60) < 0.05
            seq = np.where(err, (seq + 1) % 4, seq)
            q = (rng.integers(10, 40, 60) + 33).astype(np.uint8)
            r = SamRecord(f"r{i}", 0, 0, pos, 60, cigar_from_str("60M"),
                          seq=decode_seq(seq),
                          qual=q.tobytes().decode("latin1"))
            r.set_tag("RG", "Z", "rgA")
            recs.append(r)
        recs.sort(key=lambda r: r.pos)
        bam = tmp_path / "b.bam"
        write_bam(bam, header, recs)

        conf = Config(machine=Machine(8, 16), environ={},
                      load_files=False)
        conf.set("gatk.ncontigs", 4)   # 4 shards
        conf.set("gatk.bqsr.nprocs", 1)
        conf.set("log_dir", str(tmp_path / "log"))

        # clean run for the expected table
        t_ok = sbq.run_baserecal(conf, str(ref_fa), str(bam),
                                 str(tmp_path / "ok.npz"), force=True)
        expect = RecalTable.load(t_ok)

        # "kill" the run at shard 2: poison extract_covariates_columns
        real = sbq.baserecal_shard_table
        state = {"n": 0}

        def poisoned(*a, **kw):
            state["n"] += 1
            if state["n"] == 3:
                raise RuntimeError("simulated kill")
            return real(*a, **kw)

        monkeypatch.setattr(sbq, "baserecal_shard_table", poisoned)
        out = tmp_path / "resume.npz"
        import pytest as _pytest
        with _pytest.raises(Exception):
            sbq.run_baserecal(conf, str(ref_fa), str(bam), str(out),
                              force=True)
        parts = sorted((tmp_path / "resume.npz.parts").glob("*.npz"))
        assert 0 < len(parts) < 4            # some shards survived
        monkeypatch.setattr(sbq, "baserecal_shard_table", real)

        # rerun WITHOUT force: surviving parts reused, rest recomputed
        state["calls2"] = 0
        calls = []

        def counting(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(sbq, "baserecal_shard_table", counting)
        t2 = sbq.run_baserecal(conf, str(ref_fa), str(bam), str(out),
                               force=False)
        got = RecalTable.load(t2)
        assert len(calls) == 4 - len(parts)   # only missing shards ran
        assert np.array_equal(got.qual_obs, expect.qual_obs)
        assert np.array_equal(got.cycle_err, expect.cycle_err)
        assert np.array_equal(got.ctx_obs, expect.ctx_obs)
        assert not (tmp_path / "resume.npz.parts").exists()  # cleaned
