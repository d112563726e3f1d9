"""Retired MSDA kernel generations, kept for ablation only.

The production configuration is: ms_deform_attn_pallas_v9 (forward, all
query scales) + the v6 backward kernels in ms_deform_attn_pallas.py + the
pure-jnp oracle in ms_deform_attn.py. v7 (level-fused manual-DMA, union row
spans) and v8 (point-group spans + lane packing, per-chunk DMA) lost their
on-device sweeps to v9's whole-level VMEM residency
(docs/ROUND3.md "Final on-device sweep") and are no longer reachable from
the default dispatch; select them explicitly with impl="pallas_v7"/"pallas_v8"
or VNEXT_MSDA_V9=0 for A/B sweeps (tools/profile_pallas_v*.py).
"""
