"""Pipeline stages: the L5 command drivers (SURVEY.md §2.2) as functions.

Each ``run_<cmd>`` mirrors one reference subcommand driver
(src/worker-<cmd>.cpp): same inputs/outputs and artifact naming
(``part-%06d.<ext>`` shards), with compute in-process instead of forked.
"""
from .align import run_align
from .bamstages import run_markdup
from .bqsr import run_baserecal, run_bqsr, run_printreads
from .calling import run_htc, run_mutect2, run_ug
from .depth import run_depth
from .indel import run_indel
from .vcfstages import run_concat, run_joint, run_vcf_filter
from .germline import run_germline

__all__ = [
    "run_align", "run_markdup",
    "run_baserecal", "run_printreads", "run_bqsr",
    "run_htc", "run_mutect2", "run_ug",
    "run_depth", "run_indel", "run_concat", "run_joint", "run_vcf_filter",
    "run_germline",
]
