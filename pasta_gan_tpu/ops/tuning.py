"""Tunable tile parameters for the Pallas routing kernels.

The routing kernels' tile shapes trade MXU-pass granularity against skip
precision (finer dst tiles skip more of each part's support quad; finer
source tiles skip more of the norm contraction) and SMEM flag footprint
(packed bitmasks, 32 flags/word — ops/pallas_warp.py:_pack_bits).  The
defaults are the measured-best configuration on v5e (BASELINE.md round-4
routing sweep); `scripts/bench_routing.py` sweeps them on hardware.

Values are read at TRACE time: mutate `TUNING` (or use `tuned(...)`)
before the first jitted call of a routing entry point, or call
`jax.clear_caches()` to force a retrace after changing them.
"""

from __future__ import annotations

import contextlib
import dataclasses


@dataclasses.dataclass
class WarpTuning:
    # DENORM (small patch -> full frame, ops/pallas_warp.py:_warp_kernel):
    # dst rows per tile, capped so the [C*Hs, P] half-contraction stays in
    # VMEM (the cap formula lives at data/warp.py:denorm_warp_parts).
    denorm_rows_cap: int = 8
    # NORM (full frame -> small patch, _norm_kernel): dst rows per tile and
    # the source blocking factor (src_tiles x src_tiles blocks of the
    # contraction, <= 16 each way — the packed y/x flags share one word).
    norm_rows_per_tile: int = 16
    norm_src_tiles: int = 4
    # Fused denorm+erode+composite kernel on the 256 routing path
    # (ops/pallas_warp.py:_composite_kernel).  False = the separate-pass
    # pipeline (denorm kernel -> reduce_window erode -> select chain),
    # which is also the non-TPU/oracle path.
    fused_composite: bool = True
    # VMEM guard for the fused kernel: it keeps ALL N parts' sources
    # resident per grid step ([1, N*C*Hs, Ws+Hs] fp32, double-buffered).
    # Routes whose residency exceeds this budget fall back to the
    # separate-pass pipeline instead of risking a Mosaic VMEM overflow.
    # The largest shipped route (512px: 15 parts x 4ch x 128x256 x 2
    # buffers = 15.7 MB) compiles and runs fast on v5e, so the default
    # only rejects substantially bigger (custom) routes.
    fused_composite_src_budget: int = 24 << 20
    # Test hook: run the fused composite kernel in pallas interpret mode so
    # CPU CI can execute the fused call-site wiring (tests only).
    composite_interpret: bool = False


TUNING = WarpTuning()


@contextlib.contextmanager
def tuned(**kwargs):
    """Temporarily override tuning fields (bench sweeps). Does NOT clear jit
    caches — callers sweeping a jitted entry point must clear them."""
    old = {k: getattr(TUNING, k) for k in kwargs}
    try:
        for k, v in kwargs.items():
            setattr(TUNING, k, v)
        yield TUNING
    finally:
        for k, v in old.items():
            setattr(TUNING, k, v)
