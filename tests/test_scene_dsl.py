"""Scene DSL parser tests against the reference's semantics and shipped scenes."""

import numpy as np
import pytest

from cuda_raytracer_tpu.models.scene_dsl import (
    assemble_scene,
    load_scene,
    parse_scene_text,
)

REF = "/root/reference"


def test_defaults_match_reference():
    # scene.cu:571-574: width 1920, height 1080, 1 ray/px, 3 bounces.
    parsed = parse_scene_text("")
    assert (parsed.width, parsed.height) == (1920, 1080)
    assert parsed.rays_per_pixel == 1
    assert parsed.bounces == 3
    assert parsed.exposure == 0.0


def test_material_defaults_and_props():
    parsed = parse_scene_text(
        "material shiny specular 0.9 0.8 0.7 metallicity 1 roughness 0.25\n"
        "material plain\n"
    )
    shiny, plain = parsed.materials
    assert np.allclose(shiny["diffuse"], 1.0)  # default (scene.cu:653-659)
    assert np.allclose(shiny["specular"], [0.9, 0.8, 0.7])
    assert shiny["metallicity"] == 1.0 and shiny["roughness"] == 0.25
    assert shiny["ior"] == 0.0
    assert np.allclose(plain["specular"], 1.0) and np.allclose(plain["diffuse"], 1.0)


def test_quad_fan_triangulation():
    parsed = parse_scene_text(
        "material m\nquad m 0 0 0  1 0 0  1 1 0  0 1 0\n"
    )
    assert len(parsed.tri_p1) == 2
    # (p1,p2,p3) and (p1,p3,p4) — scene.cu:761-775.
    assert np.allclose(parsed.tri_p1[0], [0, 0, 0])
    assert np.allclose(parsed.tri_p2[0], [1, 0, 0])
    assert np.allclose(parsed.tri_p3[0], [1, 1, 0])
    assert np.allclose(parsed.tri_p1[1], [0, 0, 0])
    assert np.allclose(parsed.tri_p2[1], [1, 1, 0])
    assert np.allclose(parsed.tri_p3[1], [0, 1, 0])


def test_camera_normalisation_and_fov():
    parsed = parse_scene_text(
        "camera position 1 2 3 forward 0 0 2 up 0 5 0 fov 90\n"
    )
    assert np.allclose(parsed.camera_forward, [0, 0, 1])
    assert np.allclose(parsed.camera_up, [0, 1, 0])
    assert np.isclose(parsed.vertical_fov, np.pi / 2)


def test_cornell_counts():
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(width=32, height=32),
        prefer_native_bvh=False,
    )
    # 16 quads → 32 triangles, 4 materials, no spheres (SURVEY §2.27).
    assert scene.triangle_count == 32
    assert scene.sphere_count == 0
    assert scene.material_count == 4
    assert scene.config.exposure == 1.0
    assert scene.config.bounces == 10


def test_spheres_scene_counts_and_sky():
    scene = load_scene(
        f"{REF}/spheres.scene",
        config_overrides=dict(width=16, height=16),
        prefer_native_bvh=False,
    )
    assert scene.sphere_count == 4
    assert scene.triangle_count == 0
    assert scene.environment_map.shape == (1, 1, 3)
    assert np.allclose(np.asarray(scene.environment_map)[0, 0], [0.2, 0.4, 0.9])


def test_sphere_material_indices_shared_space():
    parsed = parse_scene_text(
        "material a\nmaterial b\n"
        "sphere b 0 0 0 1\n"
        "material c\n"
        "triangle a 0 0 0  1 0 0  0 1 0\n"
    )
    scene = assemble_scene(parsed, prefer_native_bvh=False)
    mi = np.asarray(scene.material_index)
    assert mi[0] == 1  # sphere → material b
    # Triangles follow immediately at the true sphere count (dense shared
    # index space, scene.cuh:110-116).
    assert mi[scene.sphere_count] == 0  # triangle → material a


def test_unknown_commands_ignored():
    parsed = parse_scene_text("nonsense 1 2 3\nmaterial m\n# not a comment either\n")
    assert len(parsed.materials) == 1


def test_missing_ply_without_substitute_raises(tmp_path):
    text = "material m\nply m missing_mesh.ply\n"
    with pytest.raises(FileNotFoundError):
        parse_scene_text(text, base_dir=str(tmp_path), allow_substitute_assets=False)


def test_unknown_material_error_has_file_and_line():
    from cuda_raytracer_tpu.models.scene_dsl import SceneParseError

    text = "material m\nsphere ghost 0 0 0 1\n"
    with pytest.raises(SceneParseError, match=r"demo\.scene:2.*ghost.*m"):
        parse_scene_text(text, filename="demo.scene")


def test_malformed_command_error_has_file_and_line():
    from cuda_raytracer_tpu.models.scene_dsl import SceneParseError

    with pytest.raises(SceneParseError, match=r"demo\.scene:2.*sphere"):
        parse_scene_text("material m\nsphere m 0 0 banana 1\n", filename="demo.scene")
    with pytest.raises(SceneParseError, match=r":1.*triangle"):
        parse_scene_text("triangle nope 0 0 0\n")
    with pytest.raises(SceneParseError, match=r":1.*camera"):
        parse_scene_text("camera position 0 0\n")
    with pytest.raises(SceneParseError, match=r":2.*quad"):
        parse_scene_text("material m\nquad m 0 0 0 1 1\n")
