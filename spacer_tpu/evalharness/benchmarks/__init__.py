"""Per-benchmark eval workers and scorers."""

from spacer_tpu.evalharness.benchmarks import (  # noqa: F401
    vsibench,
    stibench,
    sparbench,
    videomme,
    longvideobench,
    tempcompass,
)
