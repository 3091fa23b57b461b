"""Image library: format conversion round trips, blit clipping, file
sinks (reference src/framework/gui/Image.hh:36-204 semantics)."""

import numpy as np
import pytest

from tpu_rt.core.math import to_abgr
from tpu_rt.image import Image, ImageFormat


@pytest.fixture
def img():
    rng = np.random.default_rng(3)
    rgba = rng.random((13, 17, 4)).astype(np.float32)
    return Image.from_rgba(rgba)


@pytest.mark.parametrize("fmt", list(ImageFormat))
def test_format_roundtrip(img, fmt):
    packed = img.convert(fmt)
    assert packed.itemsize * packed.shape[-1] if packed.ndim == 3 else True
    back = Image.from_format(fmt, packed)
    assert (back.width, back.height) == (img.width, img.height)
    # Quantization tolerance per channel width.
    tol = {ImageFormat.RGB_565: 1 / 31, ImageFormat.RGBA_5551: 1 / 31}.get(
        fmt, 1 / 255)
    if fmt in (ImageFormat.RGB_Vec3f, ImageFormat.RGBA_Vec4f,
               ImageFormat.A_F32):
        tol = 0.0
    # Channels the format carries must round-trip within tolerance.
    if fmt in (ImageFormat.A8, ImageFormat.A_F32):
        np.testing.assert_allclose(back.data[..., 3], img.data[..., 3],
                                   atol=tol)
    else:
        np.testing.assert_allclose(back.data[..., :3], img.data[..., :3],
                                   atol=tol)
        if fmt.has_alpha and fmt != ImageFormat.RGBA_5551:
            np.testing.assert_allclose(back.data[..., 3], img.data[..., 3],
                                       atol=tol)


def test_abgr_matches_core_helper(img):
    """ABGR_8888 packing must agree with the frame path's to_abgr
    (reference RendererKernels.cu:38-56 toABGR)."""
    np.testing.assert_array_equal(img.convert(ImageFormat.ABGR_8888),
                                  to_abgr(img.data))


def test_blit_clipping():
    dst = Image(8, 6)
    dst.clear((0.5, 0.5, 0.5, 1.0))
    src = Image.from_rgba(np.ones((4, 4, 4), np.float32))
    # Partially off every edge; clipped silently like the reference.
    dst.blit(src, dx=-2, dy=-2)
    dst.blit(src, dx=6, dy=4)
    assert dst.data[0, 0, 0] == 1.0 and dst.data[1, 1, 0] == 1.0
    assert dst.data[2, 2, 0] == 0.5
    assert dst.data[5, 7, 0] == 1.0 and dst.data[4, 6, 0] == 1.0
    assert dst.data[3, 5, 0] == 0.5
    # Fully outside: no-op.
    before = dst.data.copy()
    dst.blit(src, dx=100, dy=0)
    np.testing.assert_array_equal(dst.data, before)
    # Sub-rect blit.
    dst2 = Image(8, 6)
    dst2.blit(src, dx=1, dy=1, sx=2, sy=2, w=2, h=2)
    assert dst2.data[1, 1, 0] == 1.0 and dst2.data[2, 2, 0] == 1.0
    assert dst2.data[3, 3, 0] == 0.0


def test_ppm_roundtrip(img, tmp_path):
    p = str(tmp_path / "x.ppm")
    img.to_ppm(p)
    back = Image.from_ppm(p)
    np.testing.assert_allclose(back.data[..., :3], img.data[..., :3],
                               atol=1 / 255)
    flipped = img.flip_y()
    np.testing.assert_array_equal(flipped.data, img.data[::-1])


def test_ppm_comments_and_maxval(img, tmp_path):
    # Comment lines inside the header must be skipped, not parsed as
    # pixel data; 2-byte-sample files (maxval > 255) must error loudly.
    p = str(tmp_path / "c.ppm")
    img.to_ppm(p)
    with open(p, "rb") as f:
        raw = f.read()
    magic, rest = raw.split(b"\n", 1)
    with open(p, "wb") as f:
        f.write(magic + b"\n# a comment\n# another\n" + rest)
    back = Image.from_ppm(p)
    np.testing.assert_allclose(back.data[..., :3], img.data[..., :3],
                               atol=1 / 255)

    p16 = str(tmp_path / "wide.ppm")
    with open(p16, "wb") as f:
        f.write(b"P6\n2 2\n65535\n" + bytes(24))
    with pytest.raises(ValueError, match="2-byte"):
        Image.from_ppm(p16)


def test_pixel_accessors():
    im = Image(4, 4)
    im.set_pixel(2, 1, (0.25, 0.5, 0.75, 1.0))
    np.testing.assert_allclose(im.get_pixel(2, 1), [0.25, 0.5, 0.75, 1.0])
