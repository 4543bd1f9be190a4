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
