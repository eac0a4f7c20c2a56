"""Multi-benchmark video evaluation harness.

Behavioral reference: SpaceR-Eval/ — evaluate.py orchestrator, util.py frame
loader, data_utils/* per-benchmark workers + scorers.  The TPU redesign
replaces the 4-process/4-GPU mp.Pool with a single SPMD engine per host
(sharding across hosts by process index keeps the same per-rank jsonl +
merge protocol), and replaces the __main__ constant block with EvalConfig.
"""

from spacer_tpu.evalharness.runner import (
    EvalConfig,
    SUPPORTED_TASKS,
    run_benchmark,
    score_results,
)
from spacer_tpu.evalharness.util import (
    extract_answer_text,
    format_time,
    load_video_frames,
    merge_results,
)
from spacer_tpu.evalharness.engine import QwenEngine, EchoEngine

__all__ = [
    "EvalConfig", "SUPPORTED_TASKS", "run_benchmark", "score_results",
    "extract_answer_text", "format_time", "load_video_frames",
    "merge_results", "QwenEngine", "EchoEngine",
]
