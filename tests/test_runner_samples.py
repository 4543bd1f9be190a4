"""Runner semantics (reference TestExecutor analog) + SampleSheet tests
(reference SampleSheet_UnitTest analog)."""
import time
from pathlib import Path

import pytest

from falcon_genome_tpu.pipeline.runner import (
    PipelineRunner, StageError, stage)
from falcon_genome_tpu.samples import load_sample_sheet
from falcon_genome_tpu.utils.errors import InvalidParam
from falcon_genome_tpu.utils.logutils import find_error


class TestRunner:
    def test_stage_barrier_order(self):
        log = []
        s1 = stage("first", [lambda: log.append("a"), lambda: log.append("b")],
                   nprocs=2)
        s2 = stage("second", [lambda: log.append("c")])
        PipelineRunner("t").run([s1, s2])
        assert log[2] == "c"
        assert set(log[:2]) == {"a", "b"}

    def test_fail_fast_raises_stage_error(self):
        def boom():
            raise ValueError("kaput")
        with pytest.raises(StageError) as ei:
            PipelineRunner("t").run([stage("s", [boom, lambda: 1])])
        assert "kaput" in str(ei.value)

    def test_error_dedup_across_shards(self):
        def boom():
            raise ValueError("same error in every shard")
        with pytest.raises(StageError) as ei:
            PipelineRunner("t").run(
                [stage("s", [boom] * 4, nprocs=4)])
        # one de-duplicated message, not 4 copies
        assert str(ei.value).count("same error in every shard") == 1

    def test_parallel_results_in_task_order(self):
        def make(i):
            def fn():
                time.sleep(0.01 * (4 - i))
                return i
            return fn
        (results,) = PipelineRunner("t").run(
            [stage("s", [make(i) for i in range(4)], nprocs=4)]).values()
        assert results == [0, 1, 2, 3]

    def test_resume_skips_when_outputs_exist(self, tmp_path):
        out = tmp_path / "done.txt"
        out.write_text("x")
        ran = []
        s = stage("s", [lambda: ran.append(1)], outputs=[str(out)])
        PipelineRunner("t", force=False).run([s])
        assert ran == []
        PipelineRunner("t", force=True).run([s])
        assert ran == [1]

    def test_timings_recorded(self):
        r = PipelineRunner("t")
        r.run([stage("quick", [lambda: None])])
        assert "quick" in r.timings


class TestLogScraping:
    def test_gatk_style_error(self, tmp_path):
        logp = tmp_path / "x.log"
        logp.write_text("INFO ok\n##### ERROR MESSAGE: bad things\nINFO\n")
        assert "bad things" in find_error([str(logp)])

    def test_dedup(self, tmp_path):
        msgs = []
        for i in range(3):
            p = tmp_path / f"{i}.log"
            p.write_text("[E::main] identical failure\n")
            msgs.append(str(p))
        assert find_error(msgs).count("identical failure") == 1

    def test_fallback_last_line(self, tmp_path):
        p = tmp_path / "x.log"
        p.write_text("line1\nlast line stands\n")
        assert find_error([str(p)]) == "last line stands"


class TestSampleSheet:
    def test_csv(self, tmp_path):
        sheet = tmp_path / "samples.csv"
        sheet.write_text(
            "#sample_id,fastq1,fastq2,rg,platform_id,library_id\n"
            "s1,/d/a_1.fq.gz,/d/a_2.fq.gz,rgA,illumina,libA\n"
            "s1,/d/b_1.fq.gz,/d/b_2.fq.gz,rgB,illumina,libB\n"
            "s2,/d/c_1.fq.gz,/d/c_2.fq.gz,rgC,illumina,libC\n")
        m = load_sample_sheet(sheet)
        assert set(m) == {"s1", "s2"}
        assert len(m["s1"]) == 2
        assert m["s1"][1].read_group == "rgB"
        assert m["s2"][0].library_id == "libC"

    def test_csv_missing_header_raises(self, tmp_path):
        sheet = tmp_path / "bad.csv"
        sheet.write_text("s1,/a_1.fq,/a_2.fq,rg,pl,lib\n")
        with pytest.raises(InvalidParam):
            load_sample_sheet(sheet)

    def test_csv_missing_column_raises(self, tmp_path):
        sheet = tmp_path / "bad.csv"
        sheet.write_text("#sample_id,fastq1\ns1,/a.fq\n")
        with pytest.raises(InvalidParam):
            load_sample_sheet(sheet)

    def test_dir_scan_pairs(self, tmp_path):
        for n in ("sampleA_1.fastq.gz", "sampleA_2.fastq.gz",
                  "sampleB_R1.fq", "sampleB_R2.fq", "orphan_1.fastq"):
            (tmp_path / n).write_text("@r\nA\n+\nI\n")
        m = load_sample_sheet(tmp_path)
        assert set(m) == {"sampleA", "sampleB"}
        assert m["sampleA"][0].fastq2.endswith("sampleA_2.fastq.gz")

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(InvalidParam):
            load_sample_sheet(tmp_path)
