"""Utility-layer tests: PGM io, metrics, CLI, parallel device step."""
import io
import sys

import numpy as np
import pytest

from hevce_tpu.utils import imageio, metrics


def test_pgm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 80)).astype(np.uint8)
    p = tmp_path / "x.pgm"
    imageio.write_pgm(p, img)
    back = imageio.read_pgm(p)
    np.testing.assert_array_equal(img, back)


def test_pgm_reads_reference_header_with_comment(tmp_path):
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    p = tmp_path / "c.pgm"
    p.write_bytes(b"P5\n# a comment\n3 2\n255\n" + img.tobytes())
    np.testing.assert_array_equal(imageio.read_pgm(p), img)


def test_mse_psnr():
    a = np.zeros((8, 8), np.uint8)
    b = np.full((8, 8), 2, np.uint8)
    mse, psnr = metrics.mse_psnr(a, b)
    assert mse == 4.0
    assert abs(psnr - 10 * np.log10(255 * 255 / 4.0)) < 1e-9
    assert metrics.mse_psnr(a, a)[1] == 99.0


def test_ssim_matches_skimage_if_available():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    noise = rng.integers(-6, 7, (64, 64))
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    ours = metrics.ssim(a, b)
    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        assert 0.0 < ours < 1.0
        return
    ref = structural_similarity(a, b)
    assert abs(ours - ref) < 1e-6


def test_convert_to_pgm(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    src = tmp_path / "x.png"
    Image.fromarray(rgb).save(src)
    dst = tmp_path / "x.pgm"
    imageio.convert_to_pgm(src, dst)
    got = imageio.read_pgm(dst)
    assert got.shape == (20, 30)


def test_cli_roundtrip(tmp_path, golden, capsys):
    from hevce_tpu import cli
    g = golden("images")
    img = g["img_2"]
    src = tmp_path / "in.pgm"
    imageio.write_pgm(src, img)
    out = tmp_path / "out.h265"
    rcon = tmp_path / "rcon.pgm"
    rc = cli.main([str(src), str(out), "2", str(rcon)])
    assert rc == 0
    assert out.read_bytes() == bytes(g["stream_2"])
    np.testing.assert_array_equal(imageio.read_pgm(rcon), g["rcon_2"])
    text = capsys.readouterr().out
    assert "PSNR" in text and "bits per pixel" in text


def test_device_step_sharded_mesh():
    import jax
    from hevce_tpu.parallel import batch as pb
    n = min(8, len(jax.devices()))
    mesh = pb.make_mesh(jax.devices()[:n])
    with mesh:
        fn = pb.jit_device_step(8, 2, mesh=mesh)
        args = pb.random_node_batch(8, batch=2 * n)
        q1, r1, s1, q4, r4, s4 = fn(*args)
        assert np.asarray(q1).shape == (2 * n, 35, 8, 8)
        assert np.asarray(q4).shape == (2 * n, 35, 4, 4, 4)
        # sharded result must equal unsharded
        fn0 = pb.jit_device_step(8, 2)
        q1b, *_ = fn0(*args)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q1b))


def test_encode_many_native_matches_sequential():
    from hevce_tpu.runtime.native import encode_image_native, encode_many_native
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (64, 64)).astype(np.uint8) for _ in range(4)]
    streams, rcons = encode_many_native(imgs, 3, nthreads=2)
    for im, s, r in zip(imgs, streams, rcons):
        s1, r1 = encode_image_native(im, 3)
        assert s == s1
        np.testing.assert_array_equal(r, r1)
