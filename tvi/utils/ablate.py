"""Performance-triage ablation knobs.

``jax.profiler`` device traces are unavailable through the axon tunnel
(PERF.md), so step-time decomposition is done by ablation: set
``TVI_ABLATE=comp1,comp2`` before tracing and the named components become
identity at trace time.  Strictly a profiling tool — never set in
production paths.

Components:
  transformers      - skip every TransformerSpatioTemporalModel body
  temporal_resnet   - skip the temporal branch of SpatioTemporalResBlock
  spatial_attn      - skip spatial self/cross attention inside blocks
  temporal_attn     - skip temporal attention inside temporal blocks
  temporal_self     - skip only the frame self-attention
  temporal_cross    - skip only the temporal cross-attention
  ff                - skip every transformer FeedForward (ff, ff_in)
"""

from __future__ import annotations

import os


def ablated(name: str) -> bool:
    flags = os.environ.get("TVI_ABLATE", "")
    return name in {f.strip() for f in flags.split(",") if f.strip()}
