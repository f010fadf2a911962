"""Book-1 final scene: the random-balls field (reference examples/common/
scene.rs:23-208 + examples/rtow_13_1.rs).

Layout replicates the reference's generator formulae exactly — 22x22 jittered
grid, 80/15/5 diffuse/metal/glass mix, bounce heights, avoid bands, three big
balls, checker ground, and rtow_13_1's light sphere + sky gradient. The
reference seeds a Rust StdRng (ChaCha12) whose stream we can't reproduce
bit-for-bit in numpy, so the same seed gives a *statistically identical*
scene, not the identical ball placement (SURVEY.md sect.7 "stochastic
equivalence").

Parity bridge (docs/REFERENCE_PARITY.md §2): the layout is an explicit,
dumpable/loadable artifact. `generate_layout(seed)` -> list of ball specs;
`dump_layout(path)` writes them as JSON (committed at
tests/assets/book1_layout_seed7.json); `balls_scene(layout_file=...)`
rebuilds the scene from such a file — so a dump of the reference's actual
seed-7 draw (a small Rust-side print patch) makes both renderers draw the
SAME scene and turns image comparison into an executable gate.
"""

from __future__ import annotations

import json

import numpy as np

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.scene import SceneBuilder


def generate_layout(seed: int = 7, bounce_height: float = 0.9,
                    need_speed: bool = False) -> list:
    """The small-ball draw of scene.rs:23-76 as plain data. Each entry:
    {a, b, center, kind, color?, fuzz?, ior?, speed}. `rng.normal()` in the
    reference is uniform [0,1)."""
    rng = np.random.default_rng(seed)
    out = []
    for a in range(-11, 11):
        for b in range(-11, 11):
            center = np.array([
                0.9 * rng.random() + a,
                0.2 + rng.random() * bounce_height,
                0.9 * rng.random() + b,
            ])
            ax = abs(center[0])
            avoid = np.array([center[0], 0.2, 0.0])
            in_band = (0.0 <= ax < 0.9) or (3.1 <= ax < 4.9)
            if (not in_band) or np.linalg.norm(center - avoid) >= 0.9:
                entry = {"a": a, "b": b, "center": [round(float(c), 9) for c in center]}
                mat_u = rng.random()
                if mat_u < 0.8:
                    entry["kind"] = "lambertian"
                    entry["color"] = [round(float(rng.random()), 9) for _ in range(3)]
                elif mat_u < 0.95:
                    entry["color"] = [round(0.5 + 0.5 * float(rng.random()), 9)
                                      for _ in range(3)]
                    fuzz = float(rng.random()) * 0.5
                    if fuzz < 0.1:
                        entry["kind"] = "metal"
                    else:
                        entry["kind"] = "diffuse_metal"
                        entry["fuzz"] = round(fuzz, 9)
                else:
                    entry["kind"] = "dielectric"
                    entry["ior"] = 1.5
                entry["speed"] = ([0.0, round(float(rng.random()) * 0.5, 9), 0.0]
                                  if need_speed else [0.0, 0.0, 0.0])
                out.append(entry)
    return out


def _material_of(entry: dict):
    kind = entry["kind"]
    if kind == "lambertian":
        return ir.Lambertian(ir.Constant(tuple(entry["color"])))
    if kind == "metal":
        return ir.Metal(ir.Constant(tuple(entry["color"])))
    if kind == "diffuse_metal":
        # fuzz in (0.1, 0.5) -> exponent fuzz*1000 (examples/common/scene.rs:61)
        return ir.DiffuseMetal(entry["fuzz"] * 1000.0,
                               ir.Constant(tuple(entry["color"])))
    if kind == "dielectric":
        return ir.Dielectric((1.0, 1.0, 1.0), entry.get("ior", 1.5), schlick=True)
    raise ValueError(f"unknown ball kind {kind!r}")


def add_small_balls(builder: SceneBuilder, layout: list, radius: float = 0.2):
    for entry in layout:
        builder.add(ir.Sphere(tuple(entry["center"]), radius,
                              _material_of(entry),
                              speed=tuple(entry.get("speed", (0, 0, 0)))))


def dump_layout(path: str, seed: int = 7, **kw) -> list:
    layout = generate_layout(seed, **kw)
    with open(path, "w") as f:
        json.dump({"seed": seed, "generator": "numpy-default_rng",
                   "balls": layout}, f, indent=1)
    return layout


def add_big_balls(builder: SceneBuilder):
    """scene.rs:137-160."""
    builder.add(ir.Sphere((0.0, 1.0, 0.0), 1.0, ir.Dielectric((1, 1, 1), 1.5, schlick=True)))
    builder.add(ir.Sphere((-4.0, 1.0, 0.0), 1.0, ir.Lambertian(ir.Constant((0.4, 0.2, 0.1)))))
    builder.add(ir.Sphere((4.0, 1.0, 0.0), 1.0, ir.Metal(ir.Constant((0.7, 0.6, 0.5)))))


def balls_scene(seed: int = 7, need_speed: bool = False, checker: bool = True,
                with_light: bool = True, layout_file: str | None = None) -> SceneBuilder:
    """scene.rs:162-191 (+ rtow_13_1.rs light and sky). `layout_file` loads a
    dumped ball layout (ours or the reference's) instead of drawing one."""
    builder = SceneBuilder()
    if checker:
        ground = ir.Lambertian(ir.Checker(ir.Constant((0.3, 0.3, 0.3)),
                                          ir.Constant((0.1, 0.1, 0.1)), 10.0))
    else:
        ground = ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))
    builder.add(ir.Sphere((0.0, -1000.0, 0.0), 1000.0, ground))

    if layout_file is not None:
        with open(layout_file) as f:
            layout = json.load(f)["balls"]
    else:
        layout = generate_layout(seed, need_speed=need_speed)
    add_small_balls(builder, layout)
    add_big_balls(builder)

    if with_light:
        builder.add(
            ir.Sphere((300.0, 400.0, 100.0), 12.0,
                      ir.DiffuseLight(ir.Constant((1.0, 0.9, 0.7)), 1.5)),
            light=True,
        )
    # rtow_13_1.rs:41-45 sky
    builder.set_background((0.3, 0.4, 0.5), (0.7, 0.89, 1.0))
    return builder


def balls_camera(width: int, height: int, need_shutter: bool = False):
    """scene.rs:193-208: 13,2,3 -> origin, fov 20, aperture 0.02, focus 10."""
    return build_camera(
        look_from=(13.0, 2.0, 3.0), look_at=(0.0, 0.0, 0.0), fov=20.0,
        aperture=0.02, focus_distance=10.0,
        shutter_speed=1.0 if need_shutter else 0.0,
        width=width, height=height,
    )


if __name__ == "__main__":
    import os
    import sys

    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "..", "tests", "assets",
        "book1_layout_seed7.json")
    balls = dump_layout(os.path.abspath(path))
    print(f"wrote {len(balls)} balls to {os.path.abspath(path)}")
