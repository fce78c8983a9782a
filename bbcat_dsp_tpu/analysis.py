"""Analysis/metrics layer re-exports (ref: src/RunningAverage.h, src/Histogram.h).

The reference's analysis components double as its metrics/observability layer
(SURVEY.md §5); they live in :mod:`bbcat_dsp_tpu.ops` and are re-exported here.
"""
