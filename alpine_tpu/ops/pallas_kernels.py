"""Pallas TPU kernels for the MU hot path.

All motivated by HBM bandwidth (the bottleneck at atlas scale, where X is
(genes x cells) >> VMEM):

1. ``fused_h_update``: one unguided joint-mode H update in a single pass
   over X.  For each cell tile, in VMEM: compute ``WᵀX`` on the MXU, apply
   the multiplicative Hadamard update ``H ∘ num/max(den, eps)``, then —
   the key trick — immediately accumulate ``X @ H_newᵀ`` and ``H_new @ H_newᵀ``
   for the NEXT iteration's W update, and the loss partial ``Σ (WᵀX)∘H_new``.
   The reference evaluates the same math as 4+ separate X-sized GEMMs per
   iteration (`/root/reference/alpine/main.py:596,:653-654,:736`); a plain
   XLA lowering still reads X twice per iteration (X@Hᵀ and WᵀX).  These
   kernels make one iteration cost ONE read of X — the bandwidth floor.
   They handle ragged edges by masking (grid = cdiv).

2. ``fused_iteration``: the production training kernel — (1) plus
   per-covariate prediction-loss partials and the NEXT iteration's B-update
   statistics, all packed into one natural-width accumulator, leaving only
   K-sized XLA ops between kernel calls.  Requires the cell axis pre-padded
   to a tile multiple (ops/mu.py pads once; provably neutral).

3. ``fused_transform``: the entire out-of-sample projection loop
   (`main.py:705-709`) in one pass: per cell tile, run all n_iter
   iterations of ``H ∘ (2WᵀX) / max(2(WᵀW)H, eps)`` in VMEM (columns are
   independent, so no cross-tile communication).  The numerator and WᵀW are
   loop-invariant and computed once outside.

The model layer falls back to the XLA path (ops/mu.py) for shapes that
exceed the VMEM tile budget or non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-enabled installs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

Array = jax.Array


# single implementations shared with the XLA path (mu imports this module
# only lazily, so no cycle)
from alpine_tpu.ops.mu import block_offsets as _block_offsets
from alpine_tpu.ops.mu import guided_width as _guided_width
from alpine_tpu.ops.mu import x_compute_dtype as _x_compute_dtype


def _prec(precision: str):
    """Map the config's precision name onto the in-kernel dots.  Mosaic
    only emits fp32 contraction passes when the flag is EXPLICIT — a plain
    dot_general lowers to the hardware default (bf16 passes), silently
    breaking matmul_precision='highest' parity with the XLA path (measured
    7.9e-4 vs 2.9e-7 max rel on a 256x256 f32 dot).  Only the f32-operand
    dots change; bf16-operand X-side dots are single-pass either way."""
    import jax.lax as lax

    return lax.Precision.HIGHEST if precision == "highest" else None


def _smem_spec(shape, index_map):
    """Scalar-operand BlockSpec: SMEM on TPU installs; on installs where
    pltpu failed to import (interpret-only use) memory spaces don't apply —
    dereferencing pltpu.SMEM there would crash the very fallback path the
    import guard exists for."""
    if pltpu is not None:
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.SMEM)
    return pl.BlockSpec(shape, index_map)

# VMEM budget for the X tile (bytes); double buffering doubles this.
# Swept on a v5e chip at 100k cells x 2k genes (bf16 X) with the scoped
# vmem limit raised to 64MB: 3MB -> 1082 it/s, 6MB -> 1125, 12MB -> 1126.
# (With the default 16MB scoped limit, budgets above ~3MB fail to compile.)
# int8 X re-swept (tiles are 2x wider at equal bytes): 6MB -> ~1740 it/s,
# 12MB -> 1668 — the default stays optimal across storage dtypes.
# Env overrides (tuning knobs; defaults are the swept optimum):
#   ALPINE_TPU_X_TILE_MB   - X tile budget in MB
#   ALPINE_TPU_VMEM_MB     - scoped vmem limit in MB (v5e has ~128 physical)
import os as _os

_X_TILE_BYTES = int(float(_os.environ.get("ALPINE_TPU_X_TILE_MB", 6)) * 1024 * 1024)
_VMEM_LIMIT_BYTES = int(float(_os.environ.get("ALPINE_TPU_VMEM_MB", 64)) * 1024 * 1024)
# Hard ceiling for the per-call scoped limit when a large working set
# needs more than the default 64MB (v5e has ~128MB physical VMEM; ~100MB
# scoped is safely allocatable).  The gate admits shapes up to this cap
# and the kernel raises its own scoped limit to fit them.
_VMEM_HARD_CAP = int(float(_os.environ.get("ALPINE_TPU_VMEM_CAP_MB", 100))
                     * 1024 * 1024)
_LANE = 128


# the gate and the per-call scoped limit keep this headroom over the
# working-set model (calibrated against two REAL Mosaic allocations, see
# working_set_bytes — the model lands within ~7% of measured, so 15%)
_WS_MARGIN = 1.15


def _cast_itemsize_for(itemsize: int) -> int:
    """Per-element bytes of the in-VMEM dequant copy when ONLY the storage
    itemsize is known (legacy/test callers): conservative — int8 (1B)
    dequantizes to bf16 (2B); 2B storage is treated as int16→f32 (4B) even
    though bfloat16 needs no copy; f32/f64 compute as stored (0).  Callers
    that know the dtype pass the exact width instead (mu.x_cast_itemsize
    for storage names, _cast_itemsize_for_dtype for arrays) — charging
    bfloat16 a phantom 4B copy shrinks its tiles and rejects large-gene
    bf16 shapes the kernel actually compiles.  Gate consistency rule: the
    pad-computing caller and the kernel must derive the SAME cast width,
    or their tile choices (and therefore the pad divisibility proof in
    pad_target) can disagree."""
    return {1: 2, 2: 4}.get(itemsize, 0)


def _cast_itemsize_for_dtype(dt) -> int:
    """Exact in-VMEM dequant-copy width for an actual array dtype (0 when
    storage == compute).  Same mapping as mu.x_cast_itemsize, keyed on the
    dtype instead of the storage name."""
    sdt = jnp.dtype(dt)
    cdt = jnp.dtype(_x_compute_dtype(sdt))
    return 0 if cdt == sdt else cdt.itemsize


def working_set_bytes(n_genes: int, K: int, tile: int, itemsize: int = 4,
                      n_labels: Tuple[int, ...] = (),
                      cast_itemsize: Optional[int] = None,
                      counts_mode: bool = False) -> int:
    """Conservative VMEM bytes for one fused-iteration grid step at a given
    cell-tile width.  Covers the WHOLE working set — not just the X tile
    (the round-2 gate's gap: large genes x K shapes passed the X-only check
    and then failed, or hung, inside Mosaic):

    - grid-invariant INPUT blocks, resident once: W (g,K), WtW (K,K), Bs
      (counted at width K — conservative vs the true k_i),
    - grid-invariant OUTPUT accumulators, counted TWICE — Mosaic stages
      each output in addition to the in-kernel accumulator,
    - per-step streamed blocks, double-buffered by the pipeline: the X and
      Y tiles at STORAGE width, H in + H out tiles (f32),
    - the in-VMEM dequant copy of the X/Y tile at COMPUTE width when
      storage != compute dtype (int8→bf16, int16→f32; zero for f32/bf16),
    - ~10 K-row f32 temporaries the kernel body materializes per tile
      (WtX, num, den, the guided stacks, the Hn cast for X@Hnᵀ).

    Calibration against real Mosaic stack allocations: g=20k × K=200 f32
    (no dequant) allocated 69.19M vs ~67M modeled; the int8 tile=12544
    probe allocated 127.35M vs ~119M modeled — both within the _WS_MARGIN
    headroom the gate and the per-call limit keep.  COUNTS-MODE anchors
    (round-5, benchmarks/vmem_calibration.py — actual stack parsed from
    Mosaic's compile-time OOM under a half-model limit): int8 g=2000 K=40
    tile=3072 allocated 27.25M vs 32.59M modeled; f32 g=20000 K=200
    tile=128 allocated 35.64M vs 70.64M modeled — the counts surcharge is
    conservative, so no model-reachable counts shape can fail in Mosaic."""
    labels = sum(n_labels)
    stat_rows = labels + 2 * len(n_labels) + 1  # +1: in-stats loss-dot row
    if cast_itemsize is None:
        cast_itemsize = _cast_itemsize_for(itemsize)
    fixed = 4 * (3 * n_genes * K + 3 * K * K + 2 * stat_rows * K
                 + labels * K)
    # the Y tile's in-VMEM copy is ALWAYS float32 (the kernel computes the
    # guided terms in f32 regardless of storage width), unlike the X tile
    # whose copy is at the compute width (bf16 for int8 storage)
    y_cast = 4 if itemsize < 4 else 0
    per_tile = tile * (
        (2 * itemsize + cast_itemsize) * n_genes
        + (2 * itemsize + y_cast) * labels
        + 10 * K * 4 + 2 * K * cast_itemsize
    )
    if counts_mode:
        # weighted_fast: the streamed (2, tile) counts block (double-
        # buffered), one extra (K, K) accumulator output (counted twice
        # like the others), and ~3 extra K-row f32 temporaries (the lifted
        # mask, the lifted scale, the scaled Hs)
        fixed += 4 * 2 * K * K
        per_tile += tile * (2 * 2 * 4 + 3 * K * 4)
    return fixed + per_tile


def _vmem_limit_for(ws_bytes: int) -> int:
    """Per-call scoped-vmem limit: the swept default, raised (with the
    calibration margin) up to the hard cap when the working set needs it."""
    return min(_VMEM_HARD_CAP,
               max(_VMEM_LIMIT_BYTES, int(ws_bytes * _WS_MARGIN)))


def _max_tile(n_genes: int, itemsize: int = 4, K: Optional[int] = None,
              n_labels: Tuple[int, ...] = (),
              cast_itemsize: Optional[int] = None,
              counts_mode: bool = False) -> Optional[int]:
    """Width-independent largest usable cell-tile (a lane multiple >= 128).

    Two caps: the X-tile byte budget (throughput-swept heuristic — beyond
    it, wider tiles stop helping), and — when K is known — the WHOLE
    working set against the VMEM hard cap (the kernel raises its scoped
    limit per call, up to ~100MB of the v5e's ~128MB physical VMEM),
    stepping the tile down to a single lane before giving up.  Unlike the
    round-2 X-only gate, a large gene count alone no longer disqualifies
    the kernel: g=20k float32 exceeds the 6MB X budget at any lane
    multiple but fits at tile=128 (SURVEY §7 "X >> VMEM"; round-2 verdict
    item 3).

    With K=None (legacy callers without shape info) only the X budget
    applies — the conservative pre-round-3 behavior."""
    base = (_X_TILE_BYTES // (itemsize * n_genes)) // _LANE * _LANE
    if K is None:
        return base if base >= _LANE else None
    tile = max(base, _LANE)
    # gate against cap/margin so _vmem_limit_for's headroom over the model
    # survives the cap clamp — otherwise working sets just under the cap
    # would compile with ~zero slack against the calibrated model
    budget = int(_VMEM_HARD_CAP / _WS_MARGIN)
    while tile >= _LANE:
        if working_set_bytes(n_genes, K, tile, itemsize,
                             n_labels, cast_itemsize,
                             counts_mode=counts_mode) <= budget:
            return tile
        tile -= _LANE
    return None


def _choose_tile_n(n_genes: int, n_cells: int, itemsize: int = 4,
                   K: Optional[int] = None,
                   n_labels: Tuple[int, ...] = (),
                   cast_itemsize: Optional[int] = None,
                   counts_mode: bool = False) -> Optional[int]:
    """Tile actually used by a kernel whose input width is n_cells: the
    width-independent max tile, capped at the (lane-rounded) array width so
    tiny problems don't allocate huge blocks.  (A smaller tile only shrinks
    the working set, so the cap preserves the VMEM guarantee.)"""
    tile = _max_tile(n_genes, itemsize, K, n_labels, cast_itemsize,
                     counts_mode=counts_mode)
    if tile is None:
        return None
    return min(tile, max(_LANE, (n_cells + _LANE - 1) // _LANE * _LANE))


def pad_target(n_genes: int, n_cells: int, n_devices: int = 1,
               itemsize: int = 4, K: Optional[int] = None,
               n_labels: Tuple[int, ...] = (),
               cast_itemsize: Optional[int] = None,
               counts_mode: bool = False) -> Optional[int]:
    """Zero-columns of cell-axis padding so that each of n_devices equal
    shards of the padded width W satisfies (W/n_devices) % tile == 0 for the
    tile _choose_tile_n picks AT THAT WIDTH.  Proof sketch: with
    T' = min(max_tile, round_up(cdiv(n, ndev), 128)) and
    pad = (-n) % (T' * ndev), each shard is exactly one multiple of T'
    (pad < T'*ndev bounds the shard below 2T'), and _choose_tile_n at shard
    width s = m*T' returns min(max_tile, s) which divides s (m > 1 only
    when T' = max_tile).  Keeping this arithmetic in ONE place is what
    guarantees the model layer, the engine pad, and the kernels can never
    disagree on divisibility.  Pass the SAME K/n_labels the kernel will
    run with — they participate in the tile choice (and the same
    cast_itemsize: see _cast_itemsize_for's consistency rule)."""
    t = _max_tile(n_genes, itemsize, K, n_labels, cast_itemsize,
                  counts_mode=counts_mode)
    if t is None:
        return None
    per_shard = -(-n_cells // n_devices)
    t = min(t, max(_LANE, (per_shard + _LANE - 1) // _LANE * _LANE))
    return (-n_cells) % (t * n_devices)


def h_update_supported(n_genes: int, itemsize: int = 4,
                       K: Optional[int] = None,
                       n_labels: Tuple[int, ...] = (),
                       cast_itemsize: Optional[int] = None,
                       counts_mode: bool = False) -> bool:
    """Whether the fused kernels fit their whole working set in the scoped
    VMEM limit at SOME lane-multiple tile.  `itemsize` is the STORAGE
    width — narrow dtypes (bf16/int16: 2, int8: 1) fit 2-4x more genes, so
    gating with the default 4 would silently drop exactly the atlas-scale
    fits the narrow modes target.  Pass K (total components, at the
    COMPILED/bucketed width) and n_labels so the W/XHt/stat blocks are
    budgeted too, and cast_itemsize (mu.x_cast_itemsize) when the dtype is
    known so bfloat16 isn't charged int16's phantom dequant copy — the
    gate must reject every shape the kernel itself cannot compile, and
    accept every shape it can."""
    return pltpu is not None and _max_tile(n_genes, itemsize, K,
                                           n_labels, cast_itemsize,
                                           counts_mode=counts_mode) is not None


def _mask_cols(x, i, tile_n, n_valid):
    """Zero out columns past the valid range of the last (ragged) tile."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(col + i * tile_n < n_valid, x, 0.0)


def _load_x(X_ref):
    """Read an X tile, dequantizing integer storage IN VMEM per the shared
    storage→compute mapping (mu.x_compute_dtype — one source of truth with
    the XLA path).  The HBM read — the per-iteration bottleneck — happens at
    the storage width; only the on-chip tile widens.
    Returns (tile, dtype the X-sided MXU passes run in)."""
    cdt = _x_compute_dtype(X_ref.dtype)
    x = X_ref[:]
    return (x.astype(cdt) if x.dtype != cdt else x), cdt


def _h_kernel(tile_n, n_cells, precision, eps_ref, X_ref, W_ref, H_ref,
              WtW_ref, *rest):
    """Unguided H-update kernel.  The HHt output carries K+1 rows: the
    extra last row holds the loss-dot partial Σ(WᵀX)∘Hn replicated across
    lanes — a (1,1) SMEM scalar output stalls the DMA/compute pipeline
    (see _iter_kernel), and a standalone (1, K) output would be a tiny
    unaligned block (known Mosaic hang)."""
    Hn_ref, HXt_ref, HHt_ref = rest
    i = pl.program_id(0)
    eps = eps_ref[0, 0]
    prec = _prec(precision)

    Xt, xdt = _load_x(X_ref)  # narrow X storage shrinks the dominant HBM read
    # bf16-operand X dots are exact single-pass (8-bit mantissa products fit
    # f32); forcing fp32 contraction there costs ~6x MXU for identical bits
    xprec = None if xdt == jnp.bfloat16 else prec
    Xm = _mask_cols(Xt, i, tile_n, n_cells)
    Hm = _mask_cols(H_ref[:], i, tile_n, n_cells)

    WtX = jax.lax.dot_general(
        W_ref[:].astype(xdt), Xm, (((0,), (0,)), ((), ())),
        precision=xprec, preferred_element_type=jnp.float32,
    )  # (K, tile_n), float32

    num = 2.0 * WtX
    den = 2.0 * jnp.dot(WtW_ref[:], Hm, precision=prec,
                        preferred_element_type=jnp.float32)
    Hn = Hm * (num / jnp.maximum(den, eps))
    Hn = _mask_cols(Hn, i, tile_n, n_cells)
    Hn_ref[:] = Hn

    @pl.when(i == 0)
    def _():
        HXt_ref[:] = jnp.zeros_like(HXt_ref)
        HHt_ref[:] = jnp.zeros_like(HHt_ref)

    # accumulate Hn @ Xᵀ — the (K, genes) orientation of the next W
    # update's X@Hnᵀ.  Same contraction over the tile axis, but K lands on
    # the 8-granular SUBLANE axis instead of padding to 128 output lanes:
    # at K=40 the (genes, K) orientation wastes ~2/3 of its MAC slots
    # (roofline.py mxu_model — this one dot was the single largest MXU
    # term).  The caller transposes the tiny (K, genes) block once.
    HXt_ref[:] += jax.lax.dot_general(
        Hn.astype(xdt), Xm, (((1,), (1,)), ((), ())),
        precision=xprec, preferred_element_type=jnp.float32,
    )
    HHt = jax.lax.dot_general(
        Hn, Hn, (((1,), (1,)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32
    )
    ld_row = jnp.broadcast_to(
        jnp.reshape(jnp.sum(WtX * Hn), (1, 1)), (1, HHt.shape[1]))
    HHt_ref[:] += jnp.concatenate([HHt, ld_row], axis=0)


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def fused_h_update(
    X: Array,
    W: Array,
    H: Array,
    WtW: Array,
    eps: Array,
    *,
    precision: str = "highest",
    interpret: bool = False,
) -> Tuple[Array, Array, Array, Array]:
    """Unguided (no-covariate) H update pass.
    Returns (H_new, X @ H_newᵀ, H_new @ H_newᵀ, Σ (WᵀX)∘H_new).
    Covariate configurations use ``fused_iteration`` instead."""
    g, n = X.shape
    K = H.shape[0]
    tile_n = _choose_tile_n(g, n, X.dtype.itemsize, K,
                            cast_itemsize=_cast_itemsize_for_dtype(X.dtype))
    if tile_n is None:
        raise ValueError(
            f"n_genes={g}, K={K} working set exceeds the VMEM limit for "
            "the fused H kernel"
        )
    grid = (pl.cdiv(n, tile_n),)

    full = lambda i: (0, 0)
    by_cells = lambda i: (0, i)

    in_specs = [
        _smem_spec((1, 1), full),  # eps
        pl.BlockSpec((g, tile_n), by_cells),                   # X
        pl.BlockSpec((g, K), full),                            # W
        pl.BlockSpec((K, tile_n), by_cells),                   # H
        pl.BlockSpec((K, K), full),                            # WtW
    ]
    args = [eps.reshape(1, 1), X, W, H, WtW]

    out_shape = (
        jax.ShapeDtypeStruct((K, n), jnp.float32),   # H_new
        jax.ShapeDtypeStruct((K, g), jnp.float32),   # Hn@Xᵀ accumulator
        # HHt accumulator + the loss-dot partial as a final extra row
        # (see _h_kernel — no SMEM scalar output)
        jax.ShapeDtypeStruct((K + 1, K), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((K, tile_n), by_cells),
        pl.BlockSpec((K, g), full),
        pl.BlockSpec((K + 1, K), full),
    )

    kernel = functools.partial(_h_kernel, tile_n, n, precision)
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_for(
                working_set_bytes(g, K, tile_n, X.dtype.itemsize,
                                  cast_itemsize=_cast_itemsize_for_dtype(
                                      X.dtype)))
        )
    Hn, HXt, HHt_ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(*args)
    # (K, genes) -> (genes, K): a tiny XLA transpose outside the kernel
    return Hn, HXt.T, HHt_ld[:K], HHt_ld[K, 0]


def _iter_kernel(blocks, n_labels, loss_kl, precision, counts_mode, *refs):
    """Whole-iteration kernel (cell axis pre-padded to a tile multiple, so
    no edge masking): H update with in-kernel guided terms, PLUS
    per-covariate prediction-loss partials and the B-update statistics for
    the NEXT iteration — eliminating every per-iteration XLA pass over H.

    The guided terms for ALL covariates are computed by single dots against
    the block-embedded Bg (Σlabels, Kg), Kg = sum of the guided blocks —
    B_c's columns sit at its block offset, exact zeros elsewhere — instead
    of a per-covariate chain of tiny dots.  Bitwise-identical sums: the extra contraction terms are
    exact float zeros (0·h = ±0, s + ±0 = s for the finite non-negative
    operands here), and the per-row λ/2λ scaling happens AFTER each dot
    exactly as the per-covariate code did.  Measured on a v5e at the bench
    shape (K=40, labels (2,3)): the per-covariate chain cost 0.11 ms/iter
    of serial small-dot latency on top of the 0.36 ms DMA-overlapped
    floor; combining the dots removes most of it.

    refs layout:
      inputs : eps(SMEM), lam(SMEM), X, W, H, WtW, Y_all (Σlabels, tile),
               Bg (Σlabels, Kg) — Y_all/Bg only when covariates exist
      outputs: Hn, XHt, HHt, stats (R, K) — per covariate, in
               row order: labels_c rows of Bnum (block columns o:o+k are
               the meaningful ones), 1 Bden row (rowsum of Hn), 1 row with
               the pred-loss partial replicated across lanes; ONE final row
               carrying the loss-dot partial Σ(WᵀX)∘Hn.  Tiny
               per-covariate outputs are PACKED into one block at natural
               width K: separate (labels, k)/(1, k) outputs hung the Mosaic
               compiler, and lane-padding small rows hits an unimplemented
               relayout.  The loss dot rides the stats block rather than a
               (1,1) SMEM output: a per-step scalar accumulate through SMEM
               stalls the DMA/compute pipeline (measured +0.1 ms/iter at
               the bench shape — the VMEM-accumulator probes hid the same
               compute completely).
    """
    n_cov = len(n_labels)
    eps_ref, lam_ref = refs[0], refs[1]
    X_ref, W_ref, H_ref, WtW_ref = refs[2:6]
    n_in = 6 + (2 if n_cov else 0)
    C_ref = None
    if counts_mode:
        # (2, tile) float32: row 0 = this epoch's draw counts (H-update
        # mask), row 1 = the NEXT epoch's draw counts (the accumulated
        # stats feed the next iteration's W/B updates, which in weighted
        # mode are count-scaled contractions — mu.joint_weighted_counts_
        # update holds the algebra; the next draw is precomputable from
        # its key, so the pipelined structure is unchanged)
        C_ref = refs[n_in]
        n_in += 1
    out = refs[n_in:]
    if counts_mode:
        Hn_ref, HXt_ref, HHt_ref, HHtU_ref, stats_ref = out
    else:
        Hn_ref, HXt_ref, HHt_ref, stats_ref = out
        HHtU_ref = None

    i = pl.program_id(0)
    eps = eps_ref[0, 0]
    prec = _prec(precision)
    Xm, xdt = _load_x(X_ref)
    # see _h_kernel: bf16-operand X dots are exact single-pass
    xprec = None if xdt == jnp.bfloat16 else prec
    Hm = H_ref[:]

    WtX = jax.lax.dot_general(
        W_ref[:].astype(xdt), Xm, (((0,), (0,)), ((), ())),
        precision=xprec, preferred_element_type=jnp.float32,
    )
    num = 2.0 * WtX
    den = 2.0 * jnp.dot(WtW_ref[:], Hm, precision=prec,
                        preferred_element_type=jnp.float32)

    Yf = Bg = None
    # guided blocks sit at the TOP of H: the combined dots only ever touch
    # rows/columns 0:Kg, so Bg is embedded at width Kg (not K) and the
    # unguided tail gets explicit zero rows — exactly the zero block the
    # per-covariate code concatenated.  gnum's output cost grows with
    # r8(Kg) instead of r8(K): at K=121/Kg=40 that's 128→40 sublanes.
    Kg = _guided_width(blocks)
    if n_cov:
        Yf = refs[6][:].astype(jnp.float32)     # (Σlabels, tile)
        Bg = refs[7][:]                         # (Σlabels, Kg), block-embedded
        # per-H-row λ over the guided rows: jnp.full broadcasts the SMEM
        # scalar — no lane→sublane relayout
        lam_rows = jnp.concatenate(
            [jnp.full((blocks[c], 1), lam_ref[c, 0], jnp.float32)
             for c in range(n_cov)], axis=0)     # (Kg, 1)
        BH = jnp.dot(Bg, Hm[:Kg], precision=prec,
                     preferred_element_type=jnp.float32)  # rows = B_c@H_c
        contract_l = (((0,), (0,)), ((), ()))
        zero_tail = jnp.zeros((Hm.shape[0] - Kg, Hm.shape[1]), jnp.float32)
        if loss_kl:
            Z = Yf / jnp.maximum(BH, eps)
            gnum = lam_rows * jax.lax.dot_general(
                Bg, Z, contract_l, precision=prec,
                preferred_element_type=jnp.float32)          # (Kg, tile)
            # den add is a (K,1) sublane-concat + lane-broadcast — same
            # values as the dense per-block broadcast_to the per-covariate
            # code built
            gden = jnp.concatenate(
                [lam_rows * jnp.sum(Bg, axis=0)[:, None],
                 jnp.zeros((Hm.shape[0] - Kg, 1), jnp.float32)], axis=0)
            num = num + jnp.concatenate([gnum, zero_tail], axis=0)
            den = den + gden
        else:
            gnum = 2.0 * lam_rows * jax.lax.dot_general(
                Bg, Yf, contract_l, precision=prec,
                preferred_element_type=jnp.float32)
            gden = 2.0 * lam_rows * jax.lax.dot_general(
                Bg, BH, contract_l, precision=prec,
                preferred_element_type=jnp.float32)
            num = num + jnp.concatenate([gnum, zero_tail], axis=0)
            den = den + jnp.concatenate([gden, zero_tail], axis=0)

    Hn = Hm * (num / jnp.maximum(den, eps))
    K_total = Hm.shape[0]
    Hs = None  # count-scaled H for the accumulated statistics
    if counts_mode:
        # undrawn columns (count 0) keep their H — the reference never
        # updates columns outside the drawn batch.  The (1, tile) count
        # rows are lifted to (K, tile) via rank-1 MXU dots: a direct
        # sublane-broadcast of a (1, n) mask is unimplemented in Mosaic
        # (see the relayout pitfalls above), but ones(K,1) @ row(1,t) is
        # an ordinary dot.
        ones_col = jnp.ones((K_total, 1), jnp.float32)
        lift = lambda row: jax.lax.dot_general(
            ones_col, row, (((1,), (0,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32)
        m = lift((C_ref[0:1, :] > 0).astype(jnp.float32))
        Hn = Hm + (Hn - Hm) * m
        Hs = Hn * lift(C_ref[1:2, :])
    Hn_ref[:] = Hn

    @pl.when(i == 0)
    def _():
        HXt_ref[:] = jnp.zeros_like(HXt_ref)
        HHt_ref[:] = jnp.zeros_like(HHt_ref)
        stats_ref[:] = jnp.zeros_like(stats_ref)
        if counts_mode:
            HHtU_ref[:] = jnp.zeros_like(HHtU_ref)

    # (K, genes) orientation: K on the sublane axis instead of 128 padded
    # output lanes — see _h_kernel's note (the caller transposes once).
    # In counts mode every contraction AGAINST the new H uses the count-
    # scaled Hs (= c_next ⊙ Hn): X diag(c) Hᵀ, H diag(c) Hᵀ, rowsum(c⊙H),
    # ratio diag(c) Hᵀ — while per-column terms (B@Hn, the losses) stay
    # unscaled; HHtU carries the UNSCALED H@Hᵀ the reconstruction loss
    # needs.
    H_stat = Hs if counts_mode else Hn
    HXt_ref[:] += jax.lax.dot_general(
        H_stat.astype(xdt), Xm, (((1,), (1,)), ((), ())),
        precision=xprec, preferred_element_type=jnp.float32,
    )
    HHt_ref[:] += jax.lax.dot_general(
        H_stat, Hn, (((1,), (1,)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32
    )
    if counts_mode:
        HHtU_ref[:] += jax.lax.dot_general(
            Hn, Hn, (((1,), (1,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32
        )
    ld_row = jnp.broadcast_to(
        jnp.reshape(jnp.sum(WtX * Hn), (1, 1)), (1, K_total))

    # prediction loss on (B_t, H_t) + B_{t+1} statistics (main.py:614-628,
    # :740-748).  yhat = Bg @ Hn computes every covariate's B_c @ Hn_c in
    # one dot (block-embedded zeros — exact), and ONE tile-contraction dot
    # produces all Bnum rows at once (the per-covariate Hn.T dots were
    # serial small-dot latency).  All rows are built at natural width K
    # (the caller slices the meaningful o:o+k columns), avoiding tiny-lane
    # relayouts.
    stat_rows = []
    if n_cov:
        rowsum_Hn = jnp.sum(H_stat, axis=1)[None, :]  # (1, K), shared Bden row
        yhat = jnp.dot(Bg, Hn[:Kg], precision=prec,
                       preferred_element_type=jnp.float32)  # (Σlabels, tile)
        if loss_kl:
            yh = jnp.maximum(yhat, eps)
            Q = Yf / yh
            E = Yf * jnp.log(jnp.maximum(Q, eps)) - Yf + yh
        else:
            d = Yf - yhat
            Q, E = Yf, d * d
        # all covariates' Bnum rows: contract the tile axis once (against
        # the count-scaled H in counts mode — ratio diag(c) Hᵀ)
        bnum_all = jax.lax.dot_general(
            Q, H_stat, (((1,), (1,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32)              # (Σlabels, K)
        row = 0
        for c in range(n_cov):
            nl = n_labels[c]
            pred = jnp.sum(E[row:row + nl])
            stat_rows.append(bnum_all[row:row + nl])             # (labels, K)
            stat_rows.append(rowsum_Hn)                          # (1, K)
            stat_rows.append(jnp.broadcast_to(jnp.reshape(pred, (1, 1)),
                                              (1, K_total)))      # (1, K)
            row += nl
    stat_rows.append(ld_row)                                     # (1, K)
    stats_ref[:] += (stat_rows[0] if len(stat_rows) == 1
                     else jnp.concatenate(stat_rows, axis=0))


@functools.partial(
    jax.jit, static_argnames=("blocks", "loss_kl", "precision", "interpret")
)
def fused_iteration(
    X: Array,
    W: Array,
    H: Array,
    WtW: Array,
    Ys: Tuple[Array, ...],
    Bs: Tuple[Array, ...],
    lam: Array,
    eps: Array,
    counts: Optional[Array] = None,
    *,
    blocks: Tuple[int, ...],
    loss_kl: bool,
    precision: str = "highest",
    interpret: bool = False,
):
    """One full H-update pass with in-kernel guided terms, prediction-loss
    partials and next-iteration B statistics.  REQUIRES the cell axis to be
    zero-padded to a multiple of the tile width (see mu._fit_scan_pallas).

    Returns (Hn, XHt, HHt, lossdot, preds(tuple), Bnums(tuple), Bdens(tuple))
    where Bdens are the KL rowsum statistics (ignored for Frobenius).

    `counts` (weighted_fast, mu.MUConfig.weighted_counts): a (2, n)
    float32 array — row 0 this epoch's multinomial draw counts (undrawn
    columns keep their H), row 1 the NEXT epoch's counts (the accumulated
    XHt/HHt/B statistics are count-scaled contractions; the pipelined
    structure is unchanged because the next draw depends only on its
    key).  The return gains an extra element after HHt: the UNSCALED
    H@Hᵀ the reconstruction loss needs (HHt itself is the scaled W-update
    statistic)."""
    g, n = X.shape
    K = H.shape[0]
    n_cov = len(Ys)
    n_labels = tuple(y.shape[0] for y in Ys)
    counts_mode = counts is not None
    tile_n = _choose_tile_n(g, n, X.dtype.itemsize, K, n_labels,
                            cast_itemsize=_cast_itemsize_for_dtype(X.dtype),
                            counts_mode=counts_mode)
    if tile_n is None:
        raise ValueError(
            f"n_genes={g}, K={K} working set exceeds the VMEM limit for "
            "the fused iteration kernel"
        )
    if n % tile_n:
        raise ValueError(f"cell axis {n} must be padded to a multiple of {tile_n}")
    grid = (n // tile_n,)

    full = lambda i: (0, 0)
    by_cells = lambda i: (0, i)

    in_specs = [
        _smem_spec((1, 1), full),              # eps
        _smem_spec((max(n_cov, 1), 1), full),  # lam
        pl.BlockSpec((g, tile_n), by_cells),
        pl.BlockSpec((g, K), full),
        pl.BlockSpec((K, tile_n), by_cells),
        pl.BlockSpec((K, K), full),
    ]
    lam_arr = (jnp.reshape(lam.astype(jnp.float32), (n_cov, 1)) if n_cov
               else jnp.zeros((1, 1), jnp.float32))
    args = [eps.reshape(1, 1).astype(jnp.float32), lam_arr, X, W, H, WtW]
    if n_cov:
        # one streamed (Σlabels, tile) Y block and one block-embedded
        # (Σlabels, Kg) B over the GUIDED columns only — the kernel's
        # guided terms are single dots against these (see _iter_kernel;
        # exact-zero embedding, unguided tail handled by explicit zeros)
        L = sum(n_labels)
        Kg = _guided_width(blocks)
        offs = _block_offsets(blocks)
        y_all = Ys[0] if n_cov == 1 else jnp.concatenate(Ys, axis=0)
        b_emb = jnp.concatenate(
            [jnp.pad(b.astype(jnp.float32),
                     ((0, 0), (offs[c], Kg - offs[c] - blocks[c])))
             for c, b in enumerate(Bs)], axis=0)
        in_specs.append(pl.BlockSpec((L, tile_n), by_cells))
        args.append(y_all)
        in_specs.append(pl.BlockSpec((L, Kg), full))
        args.append(b_emb)
    if counts_mode:
        if not n_cov:
            raise ValueError("counts mode requires covariates (weighted "
                             "sampling balances over them)")
        in_specs.append(pl.BlockSpec((2, tile_n), by_cells))
        args.append(counts.astype(jnp.float32))

    out_shape = [
        jax.ShapeDtypeStruct((K, n), jnp.float32),
        jax.ShapeDtypeStruct((K, g), jnp.float32),  # Hn@Xᵀ accumulator
        jax.ShapeDtypeStruct((K, K), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((K, tile_n), by_cells),
        pl.BlockSpec((K, g), full),
        pl.BlockSpec((K, K), full),
    ]
    if counts_mode:  # the unscaled H@Hᵀ for the reconstruction loss
        out_shape.append(jax.ShapeDtypeStruct((K, K), jnp.float32))
        out_specs.append(pl.BlockSpec((K, K), full))
    # +1: the loss-dot partial rides the last stats row (a (1,1) SMEM
    # scalar output measurably stalled the pipeline — see _iter_kernel)
    stat_rows = sum(n_labels) + 2 * n_cov + 1
    out_shape.append(jax.ShapeDtypeStruct((stat_rows, K), jnp.float32))
    out_specs.append(pl.BlockSpec((stat_rows, K), full))

    kernel = functools.partial(_iter_kernel, blocks, n_labels, loss_kl,
                               precision, counts_mode)
    kwargs = {}
    if not interpret and pltpu is not None:
        # v5e has ~128MB of VMEM; the default 16MB scoped limit throttles
        # double-buffering of the X tiles, and large gene×K working sets
        # raise the limit further (up to the hard cap the gate enforced)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_for(
                working_set_bytes(g, K, tile_n, X.dtype.itemsize, n_labels,
                                  cast_itemsize=_cast_itemsize_for_dtype(
                                      X.dtype),
                                  counts_mode=counts_mode))
        )
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        **kwargs,
    )(*args)
    if counts_mode:
        Hn, HXt, HHt, HHtU, stats = results
    else:
        Hn, HXt, HHt, stats = results
    preds, bnums, bdens = [], [], []
    row = 0
    offsets = _block_offsets(blocks)
    for c in range(n_cov):
        nl, o, k = n_labels[c], offsets[c], blocks[c]
        bnums.append(stats[row:row + nl, o:o + k])
        bdens.append(stats[row + nl, o:o + k])
        preds.append(stats[row + nl + 1, 0])
        row += nl + 2
    ld = stats[row, 0]
    # (K, genes) -> (genes, K): a tiny XLA transpose outside the kernel
    if counts_mode:
        return (Hn, HXt.T, HHt, HHtU, ld, tuple(preds), tuple(bnums),
                tuple(bdens))
    return Hn, HXt.T, HHt, ld, tuple(preds), tuple(bnums), tuple(bdens)


# ---------------------------------------------------------------------------
# Transform
# ---------------------------------------------------------------------------


def _transform_kernel(n_iter, precision, eps_ref, num_ref, H_ref, WtW2_ref, out_ref):
    eps = eps_ref[0, 0]
    prec = _prec(precision)
    num = num_ref[:]
    WtW2 = WtW2_ref[:]

    def body(_, h):
        den = jnp.dot(WtW2, h, precision=prec,
                      preferred_element_type=jnp.float32)
        return h * (num / jnp.maximum(den, eps))

    out_ref[:] = jax.lax.fori_loop(0, n_iter, body, H_ref[:])


@functools.partial(jax.jit, static_argnames=("n_iter", "precision", "interpret"))
def fused_transform(
    num2: Array,  # 2 * WᵀX, (K, n)
    H0: Array,
    WtW2: Array,  # 2 * WᵀW
    eps: Array,
    *,
    n_iter: int,
    precision: str = "highest",
    interpret: bool = False,
) -> Array:
    """All n_iter projection iterations in one pass over H (columns are
    independent; loop runs in VMEM per cell tile)."""
    K, n = H0.shape
    tile_n = min(2048, max(_LANE, (n + _LANE - 1) // _LANE * _LANE))
    grid = (pl.cdiv(n, tile_n),)
    full = lambda i: (0, 0)
    by_cells = lambda i: (0, i)

    return pl.pallas_call(
        functools.partial(_transform_kernel, n_iter, precision),
        grid=grid,
        in_specs=[
            _smem_spec((1, 1), full),
            pl.BlockSpec((K, tile_n), by_cells),
            pl.BlockSpec((K, tile_n), by_cells),
            pl.BlockSpec((K, K), full),
        ],
        out_specs=pl.BlockSpec((K, tile_n), by_cells),
        out_shape=jax.ShapeDtypeStruct((K, n), jnp.float32),
        interpret=interpret,
    )(eps.reshape(1, 1), num2, H0, WtW2)
