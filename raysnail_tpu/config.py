"""Render configuration and reference-compatibility flags.

The reference implementation has a handful of quirks (SURVEY.md sect.7 "hard
parts") that affect the rendered image. Each is gated behind a compat flag so
we can both (a) match the reference allclose for the benchmark quality gate
and (b) offer the physically-correct behavior.

Reference quirks covered (file:line cites into /root/reference):
  * hardcoded 1/pi light-branch pdf         src/camera.rs:199
  * HittablePdf value() falls back to a cosine pdf, not solid angle
                                            src/prelude/pdf.rs:254-263
  * effective spp = floor(sqrt(n))**2       src/painter.rs:110-118
  * adaptive-noise 5x5 window column bug    src/bin/raysnail.rs:163
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (trace-time) configuration of the renderer.

    All fields are hashable Python values so a RenderConfig can be closed
    over by jitted functions / used as a static argument.
    """

    # Image / sampling -----------------------------------------------------
    width: int = 800
    height: int = 500
    samples: int = 65           # requested spp; effective spp may round down
    max_depth: int = 8          # bounce budget (reference default: camera.rs:117)
    gamma: bool = True          # sqrt gamma on output (vec3.rs:225-240)

    # Numerics -------------------------------------------------------------
    dtype: Any = jnp.float32
    t_min: float = 1e-3         # reference uses 1e-4 in f64 (camera.rs:165)
    t_max: float = 3e4          # reference uses +inf; bounded for f32 (covers r=10000 ground spheres)
    shadow_eps: float = 2e-3    # reference: 0.0002 in f64 (camera.rs:211)

    # Estimator ------------------------------------------------------------
    light_sample_prob: float = 0.5   # 50/50 light-vs-BSDF split (camera.rs:194)
    compat_light_pdf: bool = True    # light branch pdf := 1/pi (camera.rs:199)
    proper_mis: bool = False         # one-sample MIS instead of compat estimator
    russian_roulette: bool = False   # optional RR termination (off = reference parity)

    # Compat flags ---------------------------------------------------------
    compat_spp_square: bool = True     # effective spp = floor(sqrt(n))**2
    compat_noise_bug: bool = False     # replicate the x=y 5x5 window bug
    # NOTE: the reference's untransformed-normal quirk (tf_facade.rs:49-53) is
    # a DOCUMENTED DEVIATION, not a flag: transforms are baked into primitive
    # arrays at scene-compile time and normals always use the correct
    # inverse-transpose (PARITY.md "Transform normals").

    # Execution ------------------------------------------------------------
    ray_batch: int = 1 << 25     # rays (pixels * spp cells) per device dispatch.
                                 # Dispatch round-trips dominate on the remote TPU
                                 # runtime (~45ms each): batching 16 spp of the
                                 # 400x225 balls scene into one dispatch measured
                                 # 5.1x (7.95 vs 1.55 Mrays/s). The sample axis
                                 # accumulates IN the scan carry (render.py), so
                                 # dispatch memory is O(pixels) no matter how many
                                 # spp it covers — the canonical 800x500@64spp
                                 # frame (25.6M cells) rides ONE dispatch
    use_pallas: str = "auto"     # spheres: "auto" | "never" | "force" (force => interpret off-TPU)
    mesh_pallas: str = "auto"    # triangle meshes: "auto" (kernel on accelerators,
                                 # XLA on CPU) | "never" | "force" (interpret off-TPU)
    sphere_bvh: str = "auto"     # large static sphere groups (>= 64) through the
                                 # v4 BVH traversal kernel: "auto" (on for
                                 # accelerators) | "never" | "force" (interpret
                                 # off-TPU, for tests)
    box_bvh: str = "auto"        # large axis-aligned box groups (>= 130, e.g.
                                 # book2's 400-box ground) through the packed
                                 # traversal kernel's "box" leaf kind: "auto"
                                 # (on for accelerators) | "never" | "force"
                                 # (interpret off-TPU, for tests)
    path_regen: str = "auto"     # path-regeneration bounce loop ("auto" = on
                                 # for forward renders with the fast RNG):
                                 # a dead lane immediately starts its pixel's
                                 # next sample inside one while_loop, curing
                                 # the scan loop's ~30% live-lane occupancy
                                 # (scripts/alive_stats.py). "never" forces
                                 # the per-sample scan loop (the gradient
                                 # path always uses it).
    mesh_sort: bool = False      # octant-sort rays into coherent packets before
                                 # the pallas mesh traversal (no-op on other paths).
                                 # Off: measured net loss at <=10k tris (argsort +
                                 # 10 gathers cost more than the coherence win)
    mesh_bin: str = "auto"       # supertile-local ray binning before the pallas
                                 # mesh traversal via gather-free one-hot MXU
                                 # permutations (ops/binning.py): "auto"
                                 # (= "entry" on accelerators, measured best:
                                 # 1.48 vs 1.14 Mrays/s on mesh+arealight;
                                 # entrydir over-fragments at 1.04) | "never" |
                                 # "entry" (root-box entry-point octant) |
                                 # "dir" (direction octant) | "entrydir"
                                 # (entry x dir, 64 bins) | "miss" (dead/miss
                                 # compaction only)
    remat_bounces: bool = True   # jax.checkpoint the bounce body: backward
                                 # stores per-bounce carries only (forward-only
                                 # renders are unaffected)
    regen_chunk_cap: int = 0     # cap on the regen-shuffle chunk width C (the
                                 # largest divisor of spp <= cap); 0 = use the
                                 # RAYSNAIL_REGEN_C env default (21). Part of
                                 # the config so changing it RETRACES — the
                                 # env var alone is captured at first trace
                                 # (ADVICE r3).
    regen_window: int = 0        # sliding-window width W for the regen-shuffle
                                 # per-cell radiance table: the (N, C) table —
                                 # whose HBM carry traffic is the canonical
                                 # frame's largest bookkeeping term
                                 # (BASELINE.md breakdown: ~245 us/iter at
                                 # C=21) — shrinks to (N, W); finished columns
                                 # retire into the pixel accumulator by a
                                 # uniform roll as soon as every lane passes
                                 # them, and a lane stalls (rare) only when
                                 # > W-1 cells ahead of the slowest lane.
                                 # 0 = full-width table (no window).
    rng: str = "auto"            # "auto" (= fast) | "fast" (counter-hash) | "threefry"
    # fast = murmur3-fmix32 counter hash: 4x on CPU and +62% end-to-end on
    # TPU v5e (measured after dispatch batching; an earlier 10x-slower TPU
    # reading predated that regime). threefry remains for crypto-grade draws.

    # Adaptive oversampling (multi-pass) ------------------------------------
    passes: int = 1
    noise_threshold: float = 0.01    # raysnail.rs:405

    @property
    def sqrt_spp(self) -> int:
        """Stratification grid edge; reference painter.rs:110-118."""
        import math
        return max(1, int(math.isqrt(self.samples)))

    @property
    def effective_samples(self) -> int:
        if self.compat_spp_square:
            return self.sqrt_spp * self.sqrt_spp
        return self.samples

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    def __hash__(self):
        return hash(tuple(
            (f.name, str(getattr(self, f.name))) for f in dataclasses.fields(self)
        ))


DEFAULT = RenderConfig()
