"""falcon_genome_tpu — a TPU-native genomics variant-calling engine.

A from-scratch re-design of the capabilities of falcon-computing/falcon-genome
(``fcs-genome``) for TPU hardware:

* the FPGA-accelerated inner loops of the reference (banded Smith-Waterman
  seed extension inside bwa-flow, PairHMM forward inside GATK
  HaplotypeCaller/Mutect2) are JAX/Pallas kernels operating on batched,
  length-bucketed read/haplotype tensors in HBM;
* the reference's process-orchestration runtime (Executor/Stage/
  BackgroundExecutor forking external binaries — see
  /root/reference/src/Executor.cpp) is a JAX pipeline: stages are pure
  functions over device arrays, scaled over a ``jax.sharding.Mesh``;
* the CLI surface mirrors the reference's subcommands
  (``fcs-genome {align,markdup,bqsr,htc,mutect2,joint,depth,vcf_filter,
  germline,ug,indel,concat,conf}`` — /root/reference/src/main.cpp:17-41).

Package layout::

    config.py     3-tier config system            (ref: src/config.cpp)
    utils/        errors, fs helpers, timing, log (ref: src/common.cpp, LogUtils.cpp)
    io/           FASTA/FASTQ/SAM/BAM/VCF codecs, interval sharders
    ops/          Pallas kernels: PairHMM, Smith-Waterman, histograms, pileup
    arrays/       batched device representations (ReadBatch, HaplotypeBatch, ...)
    stages/       align/markdup/bqsr/htc/mutect2/joint/depth/filter stage fns
    pipeline/     stage-graph runner: timing, fail-fast, artifact naming, resume
    parallel/     mesh construction, shardings, distributed init
    models/       genotyping models (germline diploid, somatic T/N, UG legacy)
    cli.py        subcommand dispatch
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, shared across processes.

    The reference pipeline forks a fresh process per stage; ours likewise
    runs each CLI subcommand as its own process, and a cold pallas-kernel
    compile costs 20-40 s on the remote-TPU transport.  With the on-disk
    cache a repeat shape loads in <1 s.  Opt out / relocate with
    FCS_JAX_CACHE_DIR ("" disables).
    """
    import os
    cache_dir = os.environ.get(
        "FCS_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "falcon_genome_tpu", "jax"))
    if not cache_dir:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - jax absent or flag renamed
        pass


_enable_compile_cache()
