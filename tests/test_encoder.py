"""End-to-end encoder tests: Python arbiter + native C++ engine vs golden
full-image streams from the reference oracle."""
import numpy as np
import pytest

from hevce_tpu.runtime.native import encode_image_native


def test_native_engine_all_golden_images(golden):
    g = golden("images")
    for t in range(int(g["n"])):
        img = g[f"img_{t}"]
        q = int(g[f"qpd6_{t}"])
        stream, rcon = encode_image_native(img, q)
        assert stream == bytes(g[f"stream_{t}"]), f"image {t} ({img.shape}, q{q})"
        np.testing.assert_array_equal(rcon, g[f"rcon_{t}"], err_msg=f"image {t}")


def test_python_encoder_one_golden_image(golden):
    # full Python path (device kernels + Python arbiter) on one 32x32 image;
    # the complete 25-image sweep is covered by the slow marker below
    from hevce_tpu.models.encoder import encode_image
    g = golden("images")
    t = 2  # 32x32 @ qpd6=2
    stream, rcon = encode_image(g[f"img_{t}"], int(g[f"qpd6_{t}"]))
    assert stream == bytes(g[f"stream_{t}"])
    np.testing.assert_array_equal(rcon, g[f"rcon_{t}"])


@pytest.mark.slow
def test_python_encoder_all_golden_images(golden):
    from hevce_tpu.models.encoder import encode_image
    g = golden("images")
    for t in range(int(g["n"])):
        stream, rcon = encode_image(g[f"img_{t}"], int(g[f"qpd6_{t}"]))
        assert stream == bytes(g[f"stream_{t}"]), f"image {t}"
        np.testing.assert_array_equal(rcon, g[f"rcon_{t}"])


def test_engines_agree_on_random_image():
    # cross-check the two implementations on an image with no golden stream
    from hevce_tpu.models.encoder import encode_image
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 256, (64, 64)).astype(np.uint8))
    for q in (0, 4):
        s_py, r_py = encode_image(img, q)
        s_cc, r_cc = encode_image_native(img, q)
        assert s_py == s_cc
        np.testing.assert_array_equal(r_py, r_cc)


def test_vector_trial_pricer_matches_scalar():
    """HEVCE_VEC=1 routes step-2/3 trial pricing through the 16-lane
    AVX-512 op-stream coder (csrc vec_trial_bits); streams must be
    BYTE-IDENTICAL to the default scalar trial path. Run in a subprocess
    because the engine latches the env var on first use. Covers a noise
    image (escape/emulation-prevention stress) and a golden natural image."""
    import os
    import subprocess
    import sys

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    code = (
        "import numpy as np\n"
        "from hevce_tpu.runtime.native import encode_image_native\n"
        f"g = np.load(r'{data}/golden_images.npz', allow_pickle=True)\n"
        f"n = np.load(r'{data}/golden_noise.npz', allow_pickle=True)\n"
        "for d, t in ((g, 0), (g, 2), (n, 0), (n, 1)):\n"
        "    s, _ = encode_image_native(d[f'img_{t}'], int(d[f'qpd6_{t}']))\n"
        "    assert s == bytes(d[f'stream_{t}']), (t, len(s))\n"
        "print('ok')\n"
    )
    env = dict(os.environ, HEVCE_VEC="1")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and r.stdout.strip() == "ok", r.stderr[-2000:]


def test_native_rejects_bad_args():
    img = np.zeros((32, 32), np.uint8)
    with pytest.raises(AssertionError):
        encode_image_native(img, 5)


def test_native_engine_noise_images(golden):
    # pure-noise images at low qpd6 stress large-coefficient / escape paths
    # (regression: a compact-vs-padded candidate-layout bug was invisible on
    #  natural images)
    g = golden("noise")
    for t in range(int(g["n"])):
        stream, _ = encode_image_native(g[f"img_{t}"], int(g[f"qpd6_{t}"]))
        assert stream == bytes(g[f"stream_{t}"]), f"noise case {t}"


def test_stream_exceeding_one_byte_per_pixel():
    """Regression (ADVICE r1, high): a 512x512 noise image at qpd6=0 encodes
    to 343,218 B — beyond the old padded_pixels + 64KiB output cap — which
    used to heap-overflow the final memcpy. Expected bytes verified against
    the reference binary (gcc -O3 /root/reference/src/*.c) on this input."""
    import hashlib
    rng = np.random.RandomState(1234)
    img = rng.randint(0, 256, (512, 512), np.uint8)
    stream, _ = encode_image_native(img, 0)
    assert len(stream) == 343218
    assert hashlib.sha256(stream).hexdigest() == (
        "084db68f454793b4d41cee87108235645bd8ecd22b1de258e079ddd4c5b8ba47")


def test_oversized_image_is_clipped_consistently():
    """Regression (ADVICE r1, low): images wider/taller than the 8192 engine
    max must be sliced host-side so the C engine's row stride stays
    consistent. 8200-wide strip == its 8192-wide slice's stream."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 8200)).astype(np.uint8)
    s_big, r_big = encode_image_native(img, 4)
    s_ref, r_ref = encode_image_native(np.ascontiguousarray(img[:, :8192]), 4)
    assert s_big == s_ref
    np.testing.assert_array_equal(r_big, r_ref)


def test_lockstep_batch_matches_sequential(golden):
    from hevce_tpu.parallel.lockstep import encode_batch
    from hevce_tpu.utils.tracing import PhaseTimer
    g = golden("images")
    img2 = g["img_2"]
    rng = np.random.default_rng(3)
    other = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    s2, r2 = encode_image_native(img2, 2)
    so, ro = encode_image_native(other, 2)
    timer = PhaseTimer()
    streams, rcons = encode_batch([img2, other, other], 2, timer=timer)
    assert streams[0] == s2 and streams[1] == so and streams[2] == so
    np.testing.assert_array_equal(rcons[0], r2)
    np.testing.assert_array_equal(rcons[1], ro)
    # the tracing subsystem is wired into the driver: phases accumulated
    assert timer.totals["host_arbiter"] > 0
    assert any(n.startswith("device_math") for n in timer.totals)
    assert "host_arbiter" in timer.report()


def test_lockstep_pipelined_matches_sequential(golden):
    """device-ahead pipelining (SURVEY §2.4 PP): the batch is split into two
    interleaved halves — one half's device step in flight while the other
    half's arbiters consume results. Must be bit-exact vs sequential."""
    from hevce_tpu.parallel.lockstep import encode_batch
    g = golden("images")
    img2 = g["img_2"]
    rng = np.random.default_rng(7)
    imgs = [img2] + [rng.integers(0, 256, (32, 32)).astype(np.uint8)
                     for _ in range(3)]
    refs = [encode_image_native(im, 2) for im in imgs]
    streams, rcons = encode_batch(imgs, 2, pipeline=True)
    for i, (s_ref, r_ref) in enumerate(refs):
        assert streams[i] == s_ref, f"image {i}"
        np.testing.assert_array_equal(rcons[i], r_ref)
    # pipelining composes with the device rate oracle (full Phase B path)
    streams, _ = encode_batch(imgs, 2, pipeline=True, node_rates=True)
    for i, (s_ref, _) in enumerate(refs):
        assert streams[i] == s_ref, f"image {i} (node_rates)"


@pytest.mark.slow
def test_lockstep_mesh_end_to_end():
    """Mesh-sharded end-to-end encode (VERDICT r1 item 5): the full Phase B
    data path (candidate math + device rate oracle) sharded over an 8-device
    'img' mesh produces bit-exact streams."""
    import jax

    from hevce_tpu.parallel.batch import make_mesh
    from hevce_tpu.parallel.lockstep import encode_batch
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (32, 32)).astype(np.uint8) for _ in range(8)]
    streams, rcons = encode_batch(imgs, 4, mesh=mesh)
    for i, im in enumerate(imgs):
        s_ref, r_ref = encode_image_native(im, 4)
        assert streams[i] == s_ref, f"image {i}"
        np.testing.assert_array_equal(rcons[i], r_ref)


def test_lockstep_with_device_node_rates(golden):
    """full Phase B data path: steps-2/3 trial rates computed on device"""
    from hevce_tpu.parallel.lockstep import encode_batch
    g = golden("images")
    img2 = g["img_2"]
    s2, r2 = encode_image_native(img2, 2)
    streams, rcons = encode_batch([img2], 2, node_rates=True)
    assert streams[0] == s2
    np.testing.assert_array_equal(rcons[0], r2)


def test_edge_case_images():
    """flat, extreme-value, and single-CTU-strip images vs the Python engine
    (both engines are independently validated vs the reference oracle)"""
    from hevce_tpu.models.encoder import encode_image
    cases = [
        np.zeros((32, 32), np.uint8),
        np.full((32, 32), 255, np.uint8),
        np.tile(np.array([[0, 255]], np.uint8), (32, 16)),  # max-contrast checker cols
        np.arange(32 * 96, dtype=np.int64).reshape(32, 96).astype(np.uint8),
    ]
    for i, img in enumerate(cases):
        for q in (0, 4):
            s_cc, r_cc = encode_image_native(img, q)
            s_py, r_py = encode_image(img, q)
            assert s_cc == s_py, f"case {i} q{q}"
            np.testing.assert_array_equal(r_cc, r_py)
