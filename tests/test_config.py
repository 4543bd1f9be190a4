"""Config-system tests, modeled on the reference's test/TestConfig.cpp:
defaults, auto-tune table, fallback propagation, file/env layering, warnings.
"""
import pytest

from falcon_genome_tpu.config import (
    Config,
    Machine,
    calc_default_worker_config,
)


def make_config(cpu=32, mem=128, environ=None, **kw):
    return Config(machine=Machine(cpu, mem), environ=environ or {},
                  load_files=kw.pop("load_files", False), **kw)


class TestAutoTune:
    # expectation table mirrors test/TestConfig.cpp:70-100 machine shapes
    @pytest.mark.parametrize("cpu,mem,exp_nprocs,exp_mem", [
        (32, 128, 32, 4),       # large node: full width
        (16, 64, 16, 4),        # mid node
        (16, 128, 16, 8),       # memory-rich: heap raised to 8
        (8, 16, 4, 4),          # 8×4 GB overshoots 16 GB: procs halved
        (8, 8, 2, 4),           # memory-starved: procs halved
        (4, 64, 4, 8),          # few cores, lots of memory
        (64, 256, 32, 8),       # cap at 32 procs
    ])
    def test_table(self, cpu, mem, exp_nprocs, exp_mem):
        nprocs, memory = calc_default_worker_config(cpu, mem)
        assert (nprocs, memory) == (exp_nprocs, exp_mem)


class TestDefaults:
    def test_core_defaults(self):
        c = make_config()
        assert c.get("gatk.ncontigs") == 32
        assert c.get("gatk.joint.ncontigs") == 32
        assert c.get("bwa.num_buckets") == 1024
        assert c.get("minimap.num_buckets") == 2048
        assert c.get("markdup.max_files") == 4096
        assert c.get("markdup.overflow-list-size") == 2000000
        assert c.get("gatk.skip_pseudo_chr") is True
        assert c.get("temp_dir") == "/tmp"

    def test_machine_scaled_defaults(self):
        c = make_config(cpu=8, mem=16)
        assert c.get("gatk.nprocs") == 4   # 8×4 GB overshoots 16 GB: halved
        assert c.get("gatk.memory") == 4
        assert c.get("markdup.nt") == 8
        assert c.get("sort.nprocs") == 8
        c2 = make_config(cpu=64, mem=256)
        assert c2.get("markdup.nt") == 16
        assert c2.get("gatk.rtc.memory") == 48


class TestFallbackChains:
    def test_per_stage_falls_back_to_global(self):
        c = make_config()
        assert c.get("gatk.htc.nprocs") == c.get("gatk.nprocs")
        assert c.get("gatk.bqsr.memory") == c.get("gatk.memory")
        assert c.get("gatk.ug.nt") == c.get("gatk.nct")

    def test_per_stage_override_sticks(self):
        c = make_config()
        c.set("gatk.htc.nprocs", 7)
        assert c.get("gatk.htc.nprocs") == 7
        assert c.get("gatk.bqsr.nprocs") == c.get("gatk.nprocs")

    def test_global_override_propagates(self):
        c = make_config()
        c.set("gatk.nprocs", 5)
        assert c.get("gatk.htc.nprocs") == 5
        assert c.get("gatk.mutect2.nprocs") == 5

    def test_scaleout_follows_latency_mode(self):
        c = make_config()
        assert c.get("bwa.scaleout_mode") is False
        c.set("latency_mode", True)
        assert c.get("bwa.scaleout_mode") is True
        assert c.get("gatk.scaleout_mode") is True


class TestLayering:
    def test_env_overrides_file(self, tmp_path, monkeypatch):
        conf = tmp_path / "falcon-genome-tpu.conf"
        conf.write_text("temp_dir=/from/file\ngatk.ncontigs=8\n")
        monkeypatch.chdir(tmp_path)
        c = Config(machine=Machine(8, 16),
                   environ={"FALCON_TEMP_DIR": "/from/env"},
                   load_files=True, root_dir=str(tmp_path / "nonexistent"))
        assert c.get("temp_dir") == "/from/env"     # env beats file
        assert c.get("gatk.ncontigs") == 8          # file beats default

    def test_legacy_fcs_env_prefix(self):
        c = make_config(environ={"FCS_TEMP_DIR": "/legacy"})
        assert c.get("temp_dir") == "/legacy"

    def test_env_not_allowlisted_ignored(self):
        # gatk.ncontigs is not env-overridable (ref config_list, config.cpp:26-40)
        c = make_config(environ={"FALCON_GATK__NCONTIGS": "4"})
        assert c.get("gatk.ncontigs") == 32

    def test_local_beats_global(self, tmp_path, monkeypatch):
        local = tmp_path / "cwd"
        root = tmp_path / "root"
        local.mkdir(); root.mkdir()
        (local / "falcon-genome-tpu.conf").write_text("gatk.ncontigs=4\n")
        (root / "falcon-genome-tpu.conf").write_text(
            "gatk.ncontigs=16\nbwa.num_buckets=99\n")
        monkeypatch.chdir(local)
        c = Config(machine=Machine(8, 16), environ={}, load_files=True,
                   root_dir=str(root))
        assert c.get("gatk.ncontigs") == 4
        assert c.get("bwa.num_buckets") == 99

    def test_sections_and_comments(self, tmp_path, monkeypatch):
        conf = tmp_path / "falcon-genome-tpu.conf"
        conf.write_text("# comment\n[gatk]\nncontigs = 12  # trailing\n")
        monkeypatch.chdir(tmp_path)
        c = Config(machine=Machine(8, 16), environ={}, load_files=True,
                   root_dir=str(tmp_path / "none"))
        assert c.get("gatk.ncontigs") == 12

    def test_type_coercion(self):
        c = make_config()
        c.set("gatk.ncontigs", "64")
        assert c.get("gatk.ncontigs") == 64
        c.set("latency_mode", "true")
        assert c.get("latency_mode") is True


class TestWarnings:
    def test_too_many_procs(self):
        c = make_config(cpu=4, mem=64)
        c.set("gatk.htc.nprocs", 100)
        warns = c.check_resources("htc")
        assert any("exceeds cpu cores" in w for w in warns)

    def test_memory_too_low(self):
        c = make_config()
        c.set("gatk.htc.memory", 2)
        assert any("too low" in w for w in c.check_resources("htc"))

    def test_memory_overcommit(self):
        c = make_config(cpu=32, mem=32)
        c.set("gatk.htc.nprocs", 32)
        c.set("gatk.htc.memory", 8)
        assert any("exceeds system memory" in w for w in c.check_resources("htc"))

    def test_ok_config_no_warnings(self):
        c = make_config(cpu=32, mem=128)
        assert c.check_resources("htc") == []


class TestHostsAndDump:
    def test_host_list_parsing(self):
        c = make_config()
        c2 = Config(machine=Machine(8, 16), environ={}, load_files=False)
        assert c2.host_list == []
        c3 = make_config()
        c3._values["hosts"] = "host1, host2 host3"
        assert c3._parse_hosts() == ["host1", "host2", "host3"]

    def test_dump_contains_all_options(self):
        c = make_config()
        out = c.dump()
        for key in ("gatk.ncontigs", "tpu.mesh.data", "bwa.num_buckets"):
            assert key in out
