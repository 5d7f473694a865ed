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
"""
