"""Named mesh presets — the TPU equivalents of the reference's
accelerate_config/acc_*.yaml GPU-subset enumeration (acc_0, acc_1, acc_2,
acc_3, acc_0_1, acc_2_3, acc_1_2_3, acc_0_1_2_3; SURVEY §2.6).

On TPU the 'gpu_ids' subset becomes a device-count choice on the data axis;
``v5e-8`` is the deployment target mesh (BASELINE.md)."""

from __future__ import annotations

from tvi.parallel.mesh import MeshSpec

PRESETS = {
    # accelerate-config parity (N-way single-node data parallel)
    "acc_0": MeshSpec(data=1),
    "acc_1": MeshSpec(data=1),
    "acc_2": MeshSpec(data=1),
    "acc_3": MeshSpec(data=1),
    "acc_0_1": MeshSpec(data=2),
    "acc_2_3": MeshSpec(data=2),
    "acc_1_2_3": MeshSpec(data=3),
    "acc_0_1_2_3": MeshSpec(data=4),
    # TPU-native targets
    "v5e-1": MeshSpec(data=1),
    "v5e-4": MeshSpec(data=4),
    "v5e-8": MeshSpec(data=8),
    "v5e-8-sp2": MeshSpec(data=4, model=2),  # optional pixel-batch sharding headroom
    "auto": MeshSpec(data=-1),
}


def get_mesh_spec(name: str) -> MeshSpec:
    if name not in PRESETS:
        raise KeyError(f"unknown topology '{name}'; options: {sorted(PRESETS)}")
    return PRESETS[name]
