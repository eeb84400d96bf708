"""Typed render / fit configuration.

The reference drives rendering with compile-time constants (tile size, spp,
march eps/steps) plus keyboard toggles (SURVEY.md §5 "Config / flag system").
Here the equivalents live in a frozen hashable dataclass passed as a static
jit argument, so every config choice is a compile-time constant for XLA — the
TPU analog of the reference's #defines.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 256
    height: int = 256
    spp: int = 1  # samples per pixel; must be a square number (stratified grid)

    # Intersection method: "auto" picks per scene contents; others force one.
    #   sdf        — sphere-trace the SDF only
    #   mesh_brute — brute-force Möller–Trumbore over all triangles
    #   mesh_grid  — uniform-grid DDA traversal
    #   mixed      — closest of sphere-trace and mesh (grid if available)
    method: str = "auto"

    # Sphere-trace march (SURVEY.md §3.3)
    max_steps: int = 96
    eps: float = 1e-3
    t_far: float = 40.0

    # Shading (SURVEY.md §2 #11)
    shadow: str = "hard"  # "none" | "hard" | "soft"
    soft_k: float = 8.0  # penumbra sharpness for soft shadows
    shadow_steps: int = 48
    shadow_bias: float = 3e-3  # offset along normal before shadow march
    ao: str = "none"  # "none" | "sdf5" (distance-field 5-tap)
    ao_strength: float = 1.0
    ao_step: float = 0.04  # tap spacing along the normal
    diff_vis: bool = True  # differentiate soft-shadow/AO factors (memory cost)

    # Execution shape: rays are processed in fixed-size blocks (lax.map) to
    # bound memory — the TPU analog of the reference's tile scheduler granule.
    block_size: int = 0  # 0 = whole image in one block

    # Anti-aliasing sample placement: None = deterministic stratified cell
    # centers (bit-reproducible, matches the CPU reference); an int seed
    # jitters each sample uniformly within its stratum (the reference's
    # jittered supersampling, SURVEY.md §2 #3) — still deterministic per seed.
    jitter_seed: Optional[int] = None

    # Differentiable soft silhouettes for SDF scenes: blend surface color over
    # background with coverage sigmoid(-d_min / width), where d_min is the
    # (differentiable) scene distance at each ray's closest-approach point.
    # 0 = hard silhouettes (reference behavior). A small width (e.g. 0.01)
    # gives visibility gradients at object edges — camera dolly and
    # translation become optimizable, which hard visibility cannot provide
    # (SURVEY.md §7 hard part 3).
    soft_silhouette: float = 0.0

    # Differentiable soft silhouettes for MESH scenes (SURVEY.md §7 hard part
    # 3, VERDICT r4 item 3): coverage ramps from 0 at a triangle's edge to 1
    # over this world-space band width, computed from the recomputed hit's
    # barycentric edge margin (min_i b_i · 2A/L_i = world distance to the
    # nearest edge within the triangle plane). Vertex/pose fits then get
    # signal at occlusion edges: moving an edge changes near-edge coverage.
    # 0 = hard mesh silhouettes (reference behavior). Trade-off (documented):
    # interior wireframe edges of closed meshes also get the thin coverage
    # ramp, bleeding a hair of background — keep the band small (~a pixel's
    # world footprint).
    mesh_silhouette: float = 0.0

    # Pallas kernel dispatch for the SDF hot loops (tpu_ray/kernels/pallas_sdf.py):
    # "auto" = on TPU with float32; "on"/"off" force. The soft-shadow Pallas
    # path additionally requires diff_vis=False (it is forward-only).
    pallas: str = "auto"

    def __post_init__(self):
        k = int(round(math.sqrt(self.spp)))
        if k * k != self.spp:
            raise ValueError(f"spp must be a square number, got {self.spp}")

    @property
    def spp_side(self) -> int:
        return int(round(math.sqrt(self.spp)))

    @property
    def num_rays(self) -> int:
        return self.width * self.height * self.spp

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class FitConfig:
    steps: int = 200
    learning_rate: float = 1e-2
    checkpoint_every: int = 50
    checkpoint_dir: Optional[str] = None
    log_every: int = 10
