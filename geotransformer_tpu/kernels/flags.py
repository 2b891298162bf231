"""Per-kernel feature flags for Mosaic mechanisms not yet proven on hardware.

Round-5 incident: the four DMA-elision kernels landed in one session
(GSE valid-rectangle skip, KPConv valid-tile skip, RPE pair-bias scores,
fused masked attention — all built on scalar-prefetched *clamped index
maps*) with interpret-mode parity tests only. Interpret mode does not
exercise Mosaic's DMA pipeline: on the real chip the first forward
containing them never returned (an on-chip hang — the program compiled in
~60 s, then execution wedged the device for 25+ min; the compile cache
timestamps prove compilation succeeded while every subsequent execution
queued forever).

Policy encoded here: a kernel mechanism that has never completed an
execution on real TPU hardware stays OFF by default and is enabled
per-name once a bounded standalone probe (scripts/probe_kernels.py) has
run it to completion on the chip. CPU interpret-mode tests always run the
kernels directly and are unaffected by these flags.

Env interface (comma-separated kernel names, or ``all``):
  GT_TPU_ENABLE_KERNELS=pair_scores,fused_attention   # allow-list additions
  GT_TPU_DISABLE_KERNELS=kpconv_tile_skip             # force-off overrides

Names: ``gse_skip``, ``kpconv_tile_skip``, ``pair_scores``,
``fused_attention``.
"""

import os

# Mechanisms proven on the real chip (bounded probe completed + parity
# checked on hardware). Move a name here — with the probe evidence cited in
# the commit — to enable it by default.
#   gse_skip         PASS 2026-08-20 12:25 max|diff|=3.9e-3 (plain index
#                    maps, pl.when compute skip only)
#   kpconv_tile_skip PASS 2026-08-20 12:27 max|diff|=0 (prefetched
#                    tile-representative block-index array)
# pair_scores / fused_attention stay off: their arithmetic clamped index
# maps are the remaining suspect for both on-chip wedges (11:16 full
# forward, 11:53 minimal clamp probe on a free chip).
_PROVEN = frozenset({"gse_skip", "kpconv_tile_skip"})

_ALL = frozenset(
    {"gse_skip", "kpconv_tile_skip", "pair_scores", "fused_attention"}
)


def _env_set(var):
    raw = os.environ.get(var, "")
    names = {s.strip() for s in raw.split(",") if s.strip()}
    if "all" in names:
        return set(_ALL)
    unknown = names - _ALL
    if unknown:
        raise ValueError(
            f"{var} names unknown kernels {sorted(unknown)}; known: {sorted(_ALL)}"
        )
    return names


def kernel_enabled(name):
    """True if the named unproven-kernel mechanism may run on this host."""
    assert name in _ALL, name
    if name in _env_set("GT_TPU_DISABLE_KERNELS"):
        return False
    return name in _PROVEN or name in _env_set("GT_TPU_ENABLE_KERNELS")
