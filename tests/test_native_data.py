"""Native (libjpeg) image loader: pixel-identical to the PIL parity path
(PIL-exact antialiased fixed-point resampling, same geometry and
normalization)."""

import numpy as np
import pytest

from scale_imagenet_tpu.native.ttdata import (
    NativeImageFolder,
    load_eval_batch,
    native_data_available,
)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    d = root / "val" / "class_a"
    d.mkdir(parents=True)
    # mixed geometries incl. pure noise — the resampler must be PIL-exact
    # even on the filter-pathological case
    for i, (w, h) in enumerate([(280, 300), (500, 375), (256, 256),
                                (300, 257)]):
        if i % 2:
            arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack([(xx * (i + 1)) % 256, (yy * 2) % 256,
                            ((xx + yy) // 2) % 256], -1).astype(np.uint8)
        Image.fromarray(arr).save(d / f"g{i}.jpg", quality=95)
    return str(root / "val")


def test_native_builds():
    assert native_data_available(), "ttdata.so failed to build"


def test_batch_decode_pixel_exact_vs_pil(jpeg_dir):
    from scale_imagenet_tpu.data import ImageFolder, imagenet_eval_transform

    ds = ImageFolder(jpeg_dir, imagenet_eval_transform)
    paths = [p for p, _ in ds.samples]
    nat, fail = load_eval_batch(paths)
    assert nat.shape == (len(paths), 224, 224, 3)
    assert int(fail.sum()) == 0
    pil = np.stack([ds[i][0] for i in range(len(ds))]).astype(np.float32)
    np.testing.assert_array_equal(nat, pil)


def test_failure_mask(tmp_path, jpeg_dir):
    bad = tmp_path / "not_a_jpeg.jpg"
    bad.write_bytes(b"garbage")
    from scale_imagenet_tpu.data import ImageFolder

    good = ImageFolder(jpeg_dir).samples[0][0]
    imgs, fail = load_eval_batch([good, str(bad)])
    assert fail.tolist() == [0, 1]
    assert np.all(imgs[1] == 0)


def test_native_image_folder(jpeg_dir):
    ds = NativeImageFolder(jpeg_dir)
    img, label = ds[0]
    assert img.shape == (224, 224, 3) and label == 0
