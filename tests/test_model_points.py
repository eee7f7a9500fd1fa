"""PLY vertex loading (ascii + binary) and models_info parsing."""

import numpy as np

from epropnp_tpu.sixdof.model_points import (
    load_models_info, load_ply_vertices)


def test_ascii_ply(tmp_path):
    verts = np.array([[0., 1., 2.], [3., 4., 5.], [-1., -2., -3.]])
    p = tmp_path / 'm.ply'
    p.write_text(
        'ply\nformat ascii 1.0\nelement vertex 3\n'
        'property float x\nproperty float y\nproperty float z\n'
        'end_header\n'
        + '\n'.join(' '.join(str(v) for v in row) for row in verts) + '\n')
    out = load_ply_vertices(str(p))
    np.testing.assert_allclose(out, verts)


def test_binary_ply(tmp_path):
    verts = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    extra = np.arange(5, dtype=np.uint8)
    p = tmp_path / 'm.ply'
    header = (b'ply\nformat binary_little_endian 1.0\n'
              b'element vertex 5\n'
              b'property float x\nproperty float y\nproperty float z\n'
              b'property uchar quality\nend_header\n')
    body = b''.join(
        verts[i].tobytes() + extra[i].tobytes() for i in range(5))
    p.write_bytes(header + body)
    out = load_ply_vertices(str(p))
    np.testing.assert_allclose(out, verts, rtol=1e-6)


def test_models_info(tmp_path):
    p = tmp_path / 'models_info.txt'
    p.write_text(
        '1: diameter: 102.099, min_x: -37.93, min_y: -38.79, min_z: -45.88\n'
        '2 diameter 247.506 min_x -107.83 min_y -60.92 min_z -109.70\n')
    info = load_models_info(str(p))
    assert info[1]['diameter'] == 102.099
    assert info[2]['min_z'] == -109.70
