"""Measured-but-superseded kernel variants (not on any production path).

Every module here is correct, tested, and LOST a measured comparison on
real TPU v5e hardware (60 s 44.1k->48k signal, batch 8, serving config).
They are kept as research baselines with their numbers; production routing
(`KernelConfig` 'auto' / `kernels.fir_frames`) never selects them.

| Module | What it is | Measured | Production winner |
|---|---|---|---|
| fir.py | BlockSpec-tiled shifted-matmul polyphase FIR | loses to the class/shear kernels (frame staging pays a generic-relayout tax) | kernels/fir_class.py (86 us/signal) |
| fir_dma.py | manual-DMA variant of fir.py | same regime, same loss | kernels/fir_class.py |
| iir.py | Pallas two-pass block IIR (re-runs recurrence from true states) | reads x twice; loses to the fused scan-free XLA EQ (~89 -> 107 us total EQ) | ops/eq.py XLA path |
| rfft_butterfly.py | radix-2 butterfly stages in VMEM | does not lower on real-TPU Mosaic (unsupported reshapes) | kernels/rfft.py four-step family |
| iir_seq.py | one-sweep sequential-carry flat EQ (VMEM state across grid steps) | does not lower on real-TPU Mosaic: the (G, d)->(1, G*d) group flatten is an unsupported shape cast (only 128-lane-wide chunks cross the sublane/lane boundary; probed exhaustively).  At the legal G=128/U=64 planar layout the Toeplitz FLOPs double AND batch at most one grid-step's rows (<=25% MXU row utilization) — analyzed slower than the XLA two-sweep's whole-signal 323-row batching even with its 2x HBM traffic | ops/eq.py XLA path (flat or frames) |
| fir_splitbank.py | rect kernel with the per-class matmul split P = 128 + 32 (round-5 VERDICT item 2b) | 129.4 vs 129.2 us/signal program time, kernel 72.2 vs 72.0 us, bitwise-identical — the MXU pads 32 -> 128 anyway, so the split is the same two lane passes | kernels/fir_class.py rect/cat |
| fir_rowdma.py | rect kernel DMAing per-virtual-row from the UNTRANSPOSED staging (kills the (B,J,s,128)->(B,s,J,128) transpose pass) | 130.7 vs 129.2 us/signal, bitwise-identical: the transpose pass (17.7 us copy_bitcast) is replaced by an equal 17.4 us reshape copy — the 4-D (.., s=147, 128) view sublane-pads 147 -> 152, so XLA materializes it either way; kernel itself +1.9 us from 512 B-burst strided rows | kernels/fir_class.py rect/cat |

Round-5 measured dead ends without modules (see STATUS): bf16 y0 emission
(55.7 dB vs oracle — fails the 60 dB gate; precision, not speed); final
correction as broadcast-multiply-reduce on the VPU (226 vs 165 us/signal —
XLA splits the rank-d update out of the clip fusion and materializes both
halves: clamp_reduce 50.1 + multiply_reduce 23.6 + copy 28.5 us).

Round-5 late entries (selectable-but-off on the production modules, like
ops/eq.equalize_frames_cat(finish='pallas')):

* **Pre-split bf16 staging** (`fir_class.polyphase_fir_class_rect_cat
  (staged_split=True)`): the staging pass emits hi|lo bf16 lane-pairs
  (same bytes) so the kernel is pure DMA + MXU.  Measured 198.3 vs 165.1
  us/signal src+eq, 102.0 dB: the kernel is UNCHANGED (580.6 vs 583.1 us
  batch-8 — the in-kernel casts pipeline behind the matmuls for free) and
  the 5-D staging transpose fissions into an extra full-size XLA pass.
  Corollary: the cat kernel is MXU + DMA-overlap bound, not VPU-bound.
* **Zero-block matmul skip: neutral — the kernel is DMA/schedule-bound.**
  For the serving plan (W=187) 70/128 classes touch only 2 of the nc=3
  bank column blocks, so 18.2% of the kernel's matmuls multiply all-zero
  bank rows; predicating them off with pl.when on a prefetched
  touched-blocks table (exact-zero terms — bitwise identical) measured
  587.9 vs 583.1 us batch-8: nothing.  Together with the staged-split
  result (casts also ~free) this pins the kernel at an empirical ~583 us
  floor set by its DMA schedule — three orthogonal interventions (VPU
  work -, MXU work -18%, cast placement) all land on the same number.
  Reverted to keep the production body simple.
* **MXU issue overhead: none** (`scripts/mxu_issue_probe.py`): the cat
  kernel's exact matmul mix runs at 92.9 TMAC/s (94% of v5e bf16 peak)
  in a VMEM-resident probe, and 72 narrow (144,128)@(128,256) matmuls
  per step == 24 wide (144,384)@(384,256) ones (468.0 vs 468.5 us for
  identical MACs) — no contiguous-contraction restructure to win.  The
  production kernel (583 us batch-8 incl. ~390 us of DMA overlapped)
  therefore sits at 80% of its pure-MXU bound; the residue is
  structurally-zero MACs (lane pad + bank spread), both measured dead.
  (Probe gotcha: identical operands per iteration get CSE'd by Mosaic —
  the first revision read an impossible 849 TMAC/s.)
* **Frames-layout pad tax: none** (`scripts/layout_probe.py`): an
  elementwise read+write of (8,144,128,160) f32 equals the flat-dense
  (8,144,20480) form exactly (286.6 vs 286.3 us, 659 GB/s) — XLA does
  NOT move pad bytes for 160-minor arrays, so a flat-emission redesign
  of the cat chain has no bandwidth to win.  The probe also pins this
  chip's ACHIEVABLE stream bandwidth at ~660 GB/s (not the 819 GB/s
  nameplate): the finish fusion (42.3 us) runs at ~85% of achievable and
  the staging at ~98% — and a lane-aligned "quad" finish (4 frames = 5
  x 128 lanes, (40, 640) weights) measured SLOWER (309.7 vs 298.8 us
  batch-8: the s_quad regroup materializes a 21 us copy).
"""
