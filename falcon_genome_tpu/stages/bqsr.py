"""``baserecal`` / ``printreads`` / ``bqsr`` stages.

Mirrors src/worker-bqsr.cpp: baserecal = per-shard BaseRecalibrator scatter
+ table gather (BQSRWorker ×ncontigs → BQSRGatherWorker, :19-79);
printreads = per-shard ApplyBQSR emitting ``part-%06d.bam`` shards
(PRWorker, :90-143); bqsr chains both (:352-363).  The per-shard tables
merge by addition (a psum in the sharded path — see parallel/sharded.py).
"""
from __future__ import annotations

import logging
from pathlib import Path

from ..bqsr import RecalModel, RecalTable, apply_bqsr, baserecal_table
from ..config import Config
from ..io.bam import write_bam
from ..io.vcf import read_vcf
from ..pipeline.runner import PipelineRunner, stage
from ..utils.common import check_input, check_output, get_contig_fname
from .bamstages import load_bam_input
from .common import interval_shards, load_fasta, records_in_shard

log = logging.getLogger("falcon_genome_tpu")


def _known_sites_set(paths: list[str], header) -> set[tuple[int, int]]:
    known: set[tuple[int, int]] = set()
    for p in paths:
        _, recs = read_vcf(check_input(p))
        for r in recs:
            tid = header.tid(r.contig)
            for off in range(len(r.ref)):
                known.add((tid, r.pos - 1 + off))
    return known


def run_baserecal(conf: Config, ref: str, input_path: str, output: str,
                  known_sites: list[str] | None = None,
                  force: bool = False) -> str:
    """Scatter + gather the recalibration table; writes <output>.npz."""
    output = check_output(output, force)
    fa = load_fasta(ref)
    header, records = load_bam_input(input_path)
    ref_by_tid = {i: fa.contig_codes(name)
                  for i, (name, _) in enumerate(header.contigs)
                  if name in fa.dict.by_name}
    rgs = [rg["ID"] for rg in header.read_groups] or ["default"]
    known = _known_sites_set(known_sites or [], header)

    shards = interval_shards(conf, fa)
    runner = PipelineRunner("Base Recalibration", force=True)
    tasks = [
        (lambda s=s: baserecal_table(
            records_in_shard(records, s, header), ref_by_tid, rgs, known))
        for s in shards if s]
    (tables,) = runner.run([stage(
        "BaseRecalibrator", tasks,
        nprocs=conf.get("gatk.bqsr.nprocs"))]).values()
    total = tables[0]
    for t in tables[1:]:
        total = total + t  # gather = addition (BQSRGatherWorker)
    total.save(output)
    log.info("baserecal: %d observations → %s",
             int(total.qual_obs.sum()), output)
    return output


def run_printreads(conf: Config, ref: str, input_path: str, table: str,
                   output: str, force: bool = False) -> str:
    """ApplyBQSR per shard → bucketed BAM shards + merged BAM."""
    output = check_output(output, force)
    fa = load_fasta(ref)
    header, records = load_bam_input(input_path)
    rtable = RecalTable.load(check_input(
        table if Path(table).exists() else table + ".npz"))
    model = RecalModel.fit(rtable)
    rg_index = {rg: i for i, rg in enumerate(rtable.read_groups)}

    shards = interval_shards(conf, fa)
    out_is_dir = Path(output).suffix != ".bam"
    runner = PipelineRunner("Print Reads", force=True)

    def one(shard, idx):
        recs = records_in_shard(records, shard, header)
        apply_bqsr(recs, model, rg_index)
        if out_is_dir:
            Path(output).mkdir(parents=True, exist_ok=True)
            path = get_contig_fname(output, idx, "bam")
            write_bam(path, header, recs)
            # sidecar .list with the shard's regions (PRWorker writes
            # .bed/.list shard metadata, BQSRWorker.cpp:180-228)
            from ..io.intervals import write_interval_list
            write_interval_list(get_contig_fname(output, idx, "list"), shard)
            return path
        return recs

    tasks = [(lambda s=s, i=i: one(s, i)) for i, s in enumerate(shards)]
    (results,) = runner.run([stage(
        "PrintReads", tasks, nprocs=conf.get("gatk.pr.nprocs"))]).values()
    if not out_is_dir:
        merged = [r for recs in results for r in recs]
        write_bam(output, header, merged)
    log.info("printreads → %s", output)
    return output


def run_bqsr(conf: Config, ref: str, input_path: str, output: str,
             known_sites: list[str] | None = None,
             force: bool = False) -> str:
    """baserecal + printreads chained (ref worker-bqsr.cpp:352-363)."""
    table = str(Path(output).with_suffix("")) + ".recal.npz"
    run_baserecal(conf, ref, input_path, table, known_sites, force=True)
    return run_printreads(conf, ref, input_path, table, output, force)
