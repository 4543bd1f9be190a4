"""Stage-graph runner with barriers, timing, fail-fast, and resume.

Semantics carried over from the reference's Executor (src/Executor.cpp):

* a *stage* is a set of tasks that run concurrently, followed by a barrier
  (Stage::run, Executor.cpp:50-72); stages run FIFO;
* per-task failures collect into a stage failure that aborts the pipeline
  (``FailedCommand``, Executor.cpp:88-99), with the operative error
  de-duplicated across shards (LogUtils::findError analog);
* every stage logs "<name> finishes in N seconds" (Executor.cpp:51,101);
* resume: a stage whose declared outputs all exist is skipped unless
  ``force`` — the reference achieves this by deterministic artifact names
  plus per-subcommand re-runs (SURVEY.md §5 checkpoint/resume).

Concurrency is a thread pool (tasks are IO + device-dispatch bound; the
GIL is released inside XLA); ``nprocs`` mirrors ``gatk.<stage>.nprocs``.
"""
from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import logging
import time
import traceback
from pathlib import Path
from typing import Callable

from ..utils.errors import FailedCommand

log = logging.getLogger("falcon_genome_tpu")


class StageError(FailedCommand):
    pass


@dataclasses.dataclass
class Task:
    fn: Callable[[], object]
    label: str = ""


@dataclasses.dataclass
class StageDef:
    name: str
    tasks: list[Task]
    outputs: list[str] = dataclasses.field(default_factory=list)
    nprocs: int = 1


def stage(name: str, tasks: list[Callable[[], object]] | list[Task],
          outputs: list[str] | None = None, nprocs: int = 1) -> StageDef:
    norm = [t if isinstance(t, Task) else Task(t, f"{name}[{i}]")
            for i, t in enumerate(tasks)]
    return StageDef(name, norm, outputs or [], nprocs)


class PipelineRunner:
    """Run stages in order; each stage is a parallel task set + barrier."""

    def __init__(self, name: str, force: bool = False):
        self.name = name
        self.force = force
        self.timings: dict[str, float] = {}

    def _should_skip(self, s: StageDef) -> bool:
        if self.force or not s.outputs:
            return False
        return all(Path(o).exists() for o in s.outputs)

    def run_stage(self, s: StageDef) -> list[object]:
        if self._should_skip(s):
            log.info("[%s] %s: outputs exist, skipping (resume)",
                     self.name, s.name)
            return []
        t0 = time.time()
        log.info("[%s] %s: %d task(s), %d worker(s)",
                 self.name, s.name, len(s.tasks), s.nprocs)
        results: list[object] = [None] * len(s.tasks)
        errors: list[tuple[str, str]] = []
        if s.nprocs <= 1 or len(s.tasks) <= 1:
            for i, t in enumerate(s.tasks):
                try:
                    results[i] = t.fn()
                except Exception:
                    errors.append((t.label, traceback.format_exc()))
                    break  # fail fast in serial mode
        else:
            with cf.ThreadPoolExecutor(max_workers=s.nprocs) as pool:
                futs = {pool.submit(t.fn): i for i, t in enumerate(s.tasks)}
                for fut in cf.as_completed(futs):
                    i = futs[fut]
                    try:
                        results[i] = fut.result()
                    except Exception:
                        errors.append((s.tasks[i].label,
                                       traceback.format_exc()))
        elapsed = time.time() - t0
        self.timings[s.name] = elapsed
        log.info("[%s] %s finishes in %d seconds", self.name, s.name,
                 int(elapsed))
        if errors:
            # de-dup the operative error across shards (LogUtils analog)
            uniq: list[str] = []
            for _, tb in errors:
                last = tb.strip().splitlines()[-1]
                if last not in uniq:
                    uniq.append(last)
            raise StageError(
                f"stage '{s.name}' failed in {len(errors)}/{len(s.tasks)} "
                f"task(s): " + " | ".join(uniq))
        return results

    def run(self, stages: list[StageDef]) -> dict[str, list[object]]:
        out = {}
        t0 = time.time()
        for s in stages:
            out[s.name] = self.run_stage(s)
        log.info("[%s] pipeline finishes in %d seconds", self.name,
                 int(time.time() - t0))
        return out
