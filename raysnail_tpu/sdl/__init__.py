"""L7 scene input: PovRay-subset SDL parser (reference: src/sdl_parser.rs)."""

from raysnail_tpu.sdl.parser import SdlParser, SceneData
from raysnail_tpu.sdl.driver import build_scene

__all__ = ["SdlParser", "SceneData", "build_scene"]
