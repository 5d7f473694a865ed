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
"""
