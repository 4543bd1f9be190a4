"""Mesh-vs-single-device HTC equality at rehearsal scale.

Round 3's mesh equivalence gate topped out at 60 kb / ~9k reads; this
runs the SAME full ``run_htc`` stage over a multi-Mb slice of the WGS
rehearsal dataset (25×, hundreds of active regions per shard, many
PairHMM lane buckets, streamed ``.bai`` input) on the 8-device virtual
CPU mesh and asserts record-equality with the single-device run — the
scaled-up version of tests/test_parallel.py's gate (the reference runs
its real workloads under scale-out, src/worker-htc.cpp:116-145).

Requires the rehearsal dataset (benchmarks/wgs_rehearsal.py) in
[workdir]; runs on CPU so both runs share a backend.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python benchmarks/mesh_rehearsal.py [workdir] [span_mb]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wgs60")
    span_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    import jax
    jax.config.update("jax_platforms", "cpu")   # shared backend
    assert jax.default_backend() == "cpu", "run on CPU (shared backend)"
    assert len(jax.devices()) >= 8, "need 8 virtual devices (XLA_FLAGS)"

    from falcon_genome_tpu import stages
    from falcon_genome_tpu.config import init as conf_init
    from falcon_genome_tpu.io.vcf import read_vcf
    from falcon_genome_tpu.parallel.mesh import (MeshSpec, make_mesh,
                                                 use_mesh)

    dedup = work / "dedup.bam"
    assert dedup.exists(), f"{dedup} missing - run wgs_rehearsal first"
    conf = conf_init(environ={})
    conf.set("temp_dir", str(work / "tmp"))
    conf.set("log_dir", str(work / "log"))
    from falcon_genome_tpu.io.fasta import FastaFile
    contig = FastaFile(str(work / "ref.fa")).dict.contigs[0].name
    intervals = work / f"slice{span_mb}.bed"
    intervals.write_text(f"{contig}\t0\t{span_mb * 1_000_000}\n")

    results = {}

    def run(tag, mesh_ctx):
        out = work / f"mesh_gate_{tag}.vcf.gz"
        t0 = time.perf_counter()
        with mesh_ctx:
            stages.run_htc(conf, str(work / "ref.fa"), str(dedup),
                           str(out), produce_vcf=True,
                           intervals=str(intervals), force=True)
        dt = time.perf_counter() - t0
        _, recs = read_vcf(str(out))
        sig = [(r.contig, r.pos, r.ref, tuple(r.alts),
                tuple(s.get("GT", "") for s in r.samples))
               for r in recs if not r.is_gvcf_block]
        results[tag] = {"wall_s": round(dt, 1), "n_calls": len(sig)}
        print(f"{tag}: {dt:.0f}s, {len(sig)} calls", flush=True)
        return sig

    mesh = make_mesh(MeshSpec(data=4, region=2), jax.devices()[:8])
    sig_single = run("single", use_mesh(None))
    sig_mesh = run("mesh8", use_mesh(mesh))

    equal = sig_single == sig_mesh
    results["equal"] = equal
    results["span_mb"] = span_mb
    out_path = Path(__file__).parent / "mesh_rehearsal.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))
    if not equal:
        only_s = set(sig_single) - set(sig_mesh)
        only_m = set(sig_mesh) - set(sig_single)
        print("only single:", sorted(only_s)[:10])
        print("only mesh:", sorted(only_m)[:10])
        sys.exit(1)


if __name__ == "__main__":
    main()
