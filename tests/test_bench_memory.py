"""tools/bench_memory.py — compiled HBM footprint (the reference's VRAM
parity row, README.md:52-60) must be measurable AOT: abstract params, no
device data. Tiny shape so the CPU compile stays cheap."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_memory_analysis_smoke():
    import bench_memory

    rec = bench_memory.measure("vits", 56, fp32=False)
    assert rec["unit"] == "GiB" and rec["dtype"] == "bfloat16"
    # weights dominate at toy resolution: vits bf16 is ~0.05 GiB of params
    assert 0.01 < rec["weights_plus_frames_gib"] < 1.0
    assert rec["value"] >= rec["weights_plus_frames_gib"]
    assert rec["temps_gib"] >= 0 and rec["output_gib"] > 0
    # no published VRAM row exists for 56 px — vs_ref must be absent
    assert rec["metric"] == "vits_hbm_gib_56" and rec["vs_ref"] is None
