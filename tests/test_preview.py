"""HTTP live-preview server (io/preview.py) — the SDL2-window equivalent
(reference: src/bin/raysnail.rs:211-308)."""

import json
import urllib.request

import numpy as np

from raysnail_tpu.io.preview import PreviewServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.status, r.read()


def test_preview_serves_page_frame_status_and_cancel():
    srv = PreviewServer(port=0)  # ephemeral port
    try:
        status, body = _get(srv.port, "/")
        assert status == 200 and b"raysnail-tpu" in body

        # no frame yet
        status, _ = None, None
        try:
            _get(srv.port, "/frame.png")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        img = np.linspace(0, 1, 8 * 6 * 3, dtype=np.float32).reshape(6, 8, 3)
        assert srv.target(5, 16, img, pass_index=1, mrays=1.5) is True

        status, png = _get(srv.port, "/frame.png")
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"

        status, body = _get(srv.port, "/status")
        s = json.loads(body)
        assert s["done"] == 5 and s["total"] == 16 and s["pass"] == 1

        # DELETE cancels: target starts returning False
        req = urllib.request.Request(f"http://127.0.0.1:{srv.port}/",
                                     method="DELETE")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.status == 200
        assert srv.target(6, 16, img) is False
    finally:
        srv.close()


def test_render_passes_honors_cancel():
    """progress returning False stops further passes (the reference's Quit
    command path that its painter never actually polled)."""
    import jax.numpy as jnp

    from raysnail_tpu import ir
    from raysnail_tpu.camera import build_camera
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.render import render_passes
    from raysnail_tpu.scene import SceneBuilder

    b = SceneBuilder()
    b.add(ir.Sphere((0, 0, -2), 0.5, ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))))
    b.set_background((1, 1, 1), (1, 1, 1))
    scene = b.compile()
    cfg = RenderConfig(width=16, height=10, samples=4, max_depth=2, passes=4,
                       noise_threshold=-1.0)  # every pixel noisy -> all passes run
    cam = build_camera(look_from=(0, 0, 0), look_at=(0, 0, -1), fov=60,
                       width=16, height=10)
    calls = []

    def cancel_after_two(done, total, img):
        calls.append(done)
        return len(calls) < 2

    render_passes(scene, cam, cfg, seed=0, progress=cancel_after_two)
    assert len(calls) == 2  # pass 3 and 4 never ran
