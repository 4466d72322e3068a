"""Pallas TPU kernels — the fused/custom-layout layer (the role of the
reference's CUTLASS inference extensions,
src/layers/extensions/inference/cutlass/)."""

from .depth_to_space import packed_frames, phase_major_perm  # noqa: F401
