"""Pipeline runtime: the stage-graph runner.

Replaces the reference's Executor/Stage/BackgroundExecutor process
orchestration (SURVEY.md §2 rows 5-7, src/Executor.cpp): stages here are
Python callables over files and device arrays, not forked binaries — so
the runner keeps the *semantics* (stage barriers, per-stage wall-clock
logs, fail-fast with error scraping, deterministic artifact naming for
resume) and drops the process machinery.
"""
from .runner import PipelineRunner, StageError, stage

__all__ = ["PipelineRunner", "StageError", "stage"]
