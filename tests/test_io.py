"""IO tests: native build, tonemap parity, PNG/PPM/EXR round trips."""

import os

import numpy as np
import pytest

from bevy_raytrace_tpu.io import native, tonemap, write_exr, write_png, write_ppm
from bevy_raytrace_tpu.io.image import _write_png_py


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return rng.random((13, 17, 3), dtype=np.float32)


def test_native_library_builds():
    assert native.load() is not None, "csrc native build failed"


def test_tonemap_matches_reference_formula(img):
    got = tonemap(img)
    want = (np.sqrt(np.clip(img, 0, 1)) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_tonemap_clips():
    x = np.array([[[-1.0, 0.0, 2.0]]], np.float32)
    np.testing.assert_array_equal(tonemap(x)[0, 0], [0, 0, 255])


def test_png_roundtrip(img, tmp_path):
    from PIL import Image

    p = os.path.join(tmp_path, "x.png")
    write_png(p, img)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, tonemap(img))


def test_png_native_matches_python(img, tmp_path):
    from PIL import Image

    pn = os.path.join(tmp_path, "n.png")
    pp = os.path.join(tmp_path, "p.png")
    write_png(pn, img)  # native path (asserted built above)
    _write_png_py(pp, tonemap(img))
    np.testing.assert_array_equal(
        np.asarray(Image.open(pn)), np.asarray(Image.open(pp))
    )


def test_ppm_roundtrip(img, tmp_path):
    p = os.path.join(tmp_path, "x.ppm")
    write_ppm(p, img)
    with open(p, "rb") as f:
        assert f.readline() == b"P6\n"
        w, h = map(int, f.readline().split())
        assert f.readline() == b"255\n"
        data = np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)
    np.testing.assert_array_equal(data, tonemap(img))


def test_exr_roundtrip_exact(img, tmp_path):
    """EXR is linear float32 — lossless round trip through OpenEXR/imageio
    if available, else validate the header manually."""
    p = os.path.join(tmp_path, "x.exr")
    write_exr(p, img)
    try:
        import OpenEXR  # noqa
        have_reader = True
    except ImportError:
        have_reader = False
    if have_reader:
        import Imath, OpenEXR

        f = OpenEXR.InputFile(p)
        dw = f.header()["dataWindow"]
        w = dw.max.x - dw.min.x + 1
        h = dw.max.y - dw.min.y + 1
        pt = Imath.PixelType(Imath.PixelType.FLOAT)
        chans = [
            np.frombuffer(f.channel(c, pt), np.float32).reshape(h, w)
            for c in ("R", "G", "B")
        ]
        back = np.stack(chans, axis=-1)
        np.testing.assert_array_equal(back, img)
    else:
        with open(p, "rb") as f:
            magic, version = np.frombuffer(f.read(8), np.uint32)
        assert magic == 20000630
        assert version == 2
        # data payload present: header + offsets + h*(8 + w*3*4) bytes
        assert os.path.getsize(p) > img.shape[0] * img.shape[1] * 3 * 4


def test_assemble_tiles_native_and_fallback():
    """Stripe assembly (the multi-host IO gather) must reproduce the
    full framebuffer exactly, with the native brt_assemble_tiles and the
    numpy fallback agreeing."""
    import numpy as np

    from bevy_raytrace_tpu.io import assemble_tiles
    from bevy_raytrace_tpu.io import native as native_mod

    rng = np.random.RandomState(3)
    full = rng.rand(300, 3).astype(np.float32)
    splits = [0, 80, 128, 300]
    tiles = [full[a:b] for a, b in zip(splits[:-1], splits[1:])]
    got = assemble_tiles(tiles, splits[:-1], 300)
    np.testing.assert_array_equal(got, full)

    # numpy fallback path (force lib absent)
    orig = native_mod.load
    native_mod.load = lambda: None
    try:
        got2 = assemble_tiles(tiles, splits[:-1], 300)
    finally:
        native_mod.load = orig
    np.testing.assert_array_equal(got2, full)
