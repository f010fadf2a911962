"""Book-1 final scene (reference examples/rtow_13_1.rs): the seeded random
balls field with a light sphere, 800x500 at samples(122) -> 121 effective spp.

    python examples/rtow_13_1.py [--cpu] [--small]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true", help="400x225 @ 16 spp")
    ap.add_argument("-o", "--outfile", default="rtow_13_1.png")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.prelude import color as colorlib
    from raysnail_tpu.render import render
    from raysnail_tpu.scenes import book1

    if args.small:
        cfg = RenderConfig(width=400, height=225, samples=16, max_depth=8)
    else:
        cfg = RenderConfig(width=800, height=500, samples=122, max_depth=8)

    scene = book1.balls_scene(seed=7).compile()
    camera = book1.balls_camera(cfg.width, cfg.height)
    t0 = time.time()
    img = render(scene, camera, cfg, seed=7)
    dt = time.time() - t0
    rays = cfg.width * cfg.height * cfg.effective_samples
    print(f"rendered {cfg.width}x{cfg.height}@{cfg.effective_samples}spp "
          f"in {dt:.1f}s ({rays / dt / 1e6:.2f} Mprimary-rays/s)")
    Image.fromarray(colorlib.to_u8(img)).save(args.outfile)
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()
