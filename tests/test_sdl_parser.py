import numpy as np
import pytest

from raysnail_tpu import ir
from raysnail_tpu.sdl.parser import ParseError, SdlParser, tokenize


def parse(text):
    return SdlParser.parse_string(text)


def test_tokenize_strips_comments():
    toks = tokenize("sphere { // a comment\n <1, 2.5, -3>, 4 }")
    assert [t.text for t in toks] == [
        "sphere", "{", "<", "1", ",", "2.5", ",", "-", "3", ">", ",", "4", "}"
    ]


def test_camera_and_light():
    s = parse("""
        camera { location <6.0, 1.0, 2.5> look_at <0, -0.8, 0> angle 50 }
        light { <300.0, 400.0, 100.0>, color rgb <1, 0.9, 0.7> }
    """)
    assert s.camera.location == (6.0, 1.0, 2.5)
    assert s.camera.look_at == (0.0, -0.8, 0.0)
    assert s.camera.fov_angle == 50.0
    assert len(s.lights) == 1
    assert s.lights[0].color == (1.0, 0.9, 0.7)


def test_sphere_with_texture():
    s = parse("sphere { <1, 0, -0.7>, 1 texture { pigment { color rgb <0.9, 0.5, 0.1> } } }")
    (obj,) = s.objects
    assert isinstance(obj, ir.Sphere)
    assert obj.center == (1.0, 0.0, -0.7)
    assert obj.radius == 1.0
    assert isinstance(obj.material, ir.Lambertian)
    assert obj.material.texture.rgb == (0.9, 0.5, 0.1)


def test_checker_scale_fixed_two():
    s = parse("""box { <0,0,0>, <1,1,1> texture { pigment {
        checker color rgb <0.3,0.3,0.3>, color rgb <0.01,0.01,0.01> } } }""")
    (obj,) = s.objects
    chk = obj.material.texture
    assert isinstance(chk, ir.Checker)
    assert chk.scale == 2.0


def test_finish_reflection_makes_mixed():
    s = parse("""sphere { <0,0,0>, 1 texture {
        pigment { color rgb <1,1,1> } finish { reflection 0.2 } } }""")
    m = s.objects[0].material
    assert isinstance(m, ir.Mixed)
    assert isinstance(m.material_1, ir.Metal)
    assert isinstance(m.material_2, ir.Lambertian)
    assert m.probability_1 == 0.2


def test_finish_phong_scaling():
    s = parse("""sphere { <0,0,0>, 1 texture {
        pigment { color rgb <1,1,1> } finish { phong 0.2 phong_size 40 } } }""")
    m = s.objects[0].material
    # phong_factor = phong*4, exponent = int(phong_size*0.1)
    assert m.phong_factor == pytest.approx(0.8)
    assert m.phong_exponent == 4.0


def test_surface_metallic_diffuse():
    s = parse("""sphere { <0,0,0>, 1 texture {
        pigment { color rgb <1,1,1> } surface { metallic diffuse 300 } } }""")
    m = s.objects[0].material
    assert isinstance(m, ir.DiffuseMetal)
    assert m.exponent == 300.0


def test_quadric_coefficient_packing():
    s = parse("quadric { <1, 2, 3>, <4, 5, 6>, <7, 8, 9>, 10 }")
    (q,) = s.objects
    # <A,E,H>, <B,C,F>, <D,G,I>, J -> (qa qb qc qd qe qf qg qh qi qj)
    assert q.coeffs == (1.0, 4.0, 5.0, 7.0, 2.0, 6.0, 8.0, 3.0, 9.0, 10.0)


def test_expressions():
    s = parse("camera { location <3.0*1.5, (1+2)*0.5, -2.5/5> look_at <0,0,0> angle 40+10 }")
    assert s.camera.location == (4.5, 1.5, -0.5)
    assert s.camera.fov_angle == 50.0


def test_declare_while_loop():
    s = parse("""
        #declare n = 0;
        #while(n < 3)
            sphere { <n, 0, 0>, 0.5 }
            #declare n = n + 1;
        #end
    """)
    assert len(s.objects) == 3
    assert [o.center[0] for o in s.objects] == [0.0, 1.0, 2.0]


def test_declare_object_instantiation():
    s = parse("""
        #declare BALL = sphere { <0, 1, 0>, 2 }
        object { BALL translate <5, 0, 0> }
        object { BALL }
    """)
    assert len(s.objects) == 2
    m = ir.unmat4(s.objects[0].transform)
    np.testing.assert_allclose(m[:3, 3], [5, 0, 0])
    assert s.objects[1].transform is None


def test_csg_difference():
    s = parse("""
        difference {
            box { <-1,-1,-1>, <1,0,1> }
            sphere { <0,0.1,0>, 0.9 }
            texture { pigment { color rgb <0.5,0.5,0.5> } }
            rotate <0, 5, 0>
        }
    """)
    (c,) = s.objects
    assert isinstance(c, ir.Csg)
    assert c.op == "difference"
    assert isinstance(c.left, ir.Box)
    assert isinstance(c.right, ir.Sphere)
    assert c.transform is not None


def test_rotate_only_nonzero_axes():
    s = parse("box { <0,0,0>, <1,1,1> rotate <0, 90, 0> }")
    m = ir.unmat4(s.objects[0].transform)
    # reference rotate_y(90deg): +x maps to -z (their sign convention)
    v = m @ np.array([1.0, 0, 0, 1.0])
    np.testing.assert_allclose(v[:3], [0, 0, -1], atol=1e-12)


def test_fixture_files_parse():
    import glob
    files = sorted(glob.glob("sdl/*.sdl"))
    assert len(files) == 5
    for f in files:
        s = SdlParser.parse(f)
        assert s.camera is not None
        assert len(s.objects) > 0


def test_parse_error_reports_line():
    with pytest.raises(ParseError, match="line 2"):
        parse("camera { location <0,0,0> look_at <0,0,1> angle 50 }\nbogus { }")


def test_declare_texture_and_color_extension(tmp_path):
    """EXTENSION: #declare of textures and colors (the reference grammar
    only allows float/vector/statement, sdl_parser.rs:814-851)."""
    sdl = tmp_path / "declares_tex.sdl"
    sdl.write_text("""
#declare Warm = color rgb <0.9, 0.6, 0.2>;
#declare Shiny = texture { pigment { color rgb Warm } finish { reflection 0.4 } };
camera { location <0, 1, -5> look_at <0, 0, 0> angle 45 }
light { <2, 4, -3> color rgb <1, 1, 1> }
sphere { <0, 0, 0>, 1 texture { Shiny } }
sphere { <2, 0, 0>, 1 texture { pigment { color Warm } } }
""")
    from raysnail_tpu.sdl.parser import SdlParser

    data = SdlParser.parse(str(sdl))
    assert len(data.objects) == 2
    m0 = data.objects[0].material
    from raysnail_tpu import ir
    assert isinstance(m0, ir.Mixed)  # reflection 0.4 -> Mixed(Metal, Lambertian)
    assert m0.probability_1 == 0.4
    assert m0.material_1.texture.rgb == (0.9, 0.6, 0.2)
    m1 = data.objects[1].material
    assert isinstance(m1, ir.Lambertian)
    assert m1.texture.rgb == (0.9, 0.6, 0.2)
