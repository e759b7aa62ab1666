"""Native C++ image-prep: build, numerics vs PIL LANCZOS, speed sanity."""
import numpy as np
import pytest

from sdxl_training_improvements_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


def pil_reference(rgb, th, tw, top, left, rh, rw, flip=False):
    from PIL import Image
    img = Image.fromarray(rgb).resize((rw, rh), Image.LANCZOS)
    img = img.crop((left, top, left + tw, top + th))
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
    return arr.transpose(2, 0, 1)


def test_identity_resize_exact():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    out = native.prepare_image_native(rgb, 32, 48, 0, 0, 32, 48)
    expect = rgb.astype(np.float32).transpose(2, 0, 1) / 127.5 - 1.0
    np.testing.assert_allclose(out, expect, atol=1e-5)


def smooth_image(sh, sw):
    """Natural-like smooth content (PIL's fixed-point Lanczos coefficients
    diverge from float weights on pure noise, so compare on smooth data)."""
    yy, xx = np.mgrid[0:sh, 0:sw].astype(np.float32)
    r = np.sin(xx / 17) * 0.5 + np.cos(yy / 23) * 0.5
    g = np.sin((xx + yy) / 31)
    b = xx / sw - yy / sh
    img = np.stack([r, g, b], axis=-1)
    return ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.uint8)


@pytest.mark.parametrize("shape,target", [((100, 150), (64, 64)),
                                          ((64, 64), (128, 128)),
                                          ((317, 211), (96, 48))])
def test_matches_pil_lanczos(shape, target):
    sh, sw = shape
    th, tw = target
    rgb = smooth_image(sh, sw)
    scale = max(tw / sw, th / sh)
    rw, rh = max(tw, round(sw * scale)), max(th, round(sh * scale))
    top, left = (rh - th) // 2, (rw - tw) // 2
    out = native.prepare_image_native(rgb, th, tw, top, left, rh, rw)
    ref = pil_reference(rgb, th, tw, top, left, rh, rw)
    diff = np.abs(out - ref)
    assert diff.mean() < 0.005, f"mean diff {diff.mean()}"
    assert np.quantile(diff, 0.99) < 0.03, f"q99 {np.quantile(diff, 0.99)}"


def test_flip():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = native.prepare_image_native(rgb, 64, 64, 0, 0, 64, 64, flip=True)
    plain = native.prepare_image_native(rgb, 64, 64, 0, 0, 64, 64, flip=False)
    np.testing.assert_allclose(out, plain[:, :, ::-1], atol=1e-6)


def test_bad_crop_rejected():
    rgb = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(ValueError, match="code 2"):
        native.prepare_image_native(rgb, 64, 64, 10, 10, 64, 64)


def test_dataset_integration():
    """prepare_image_array must route through native and stay PIL-close."""
    from PIL import Image
    from sdxl_training_improvements_tpu.data.buckets import Bucket
    from sdxl_training_improvements_tpu.data.dataset import prepare_image_array
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (120, 90, 3), dtype=np.uint8)
    img = Image.fromarray(rgb)
    arr, orig, crop = prepare_image_array(img, Bucket.from_dims(64, 64))
    assert arr.shape == (3, 64, 64)
    assert orig == (120, 90)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
