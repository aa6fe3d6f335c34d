"""Native C++ image loader: build, decode parity vs PIL, and a
throughput sanity check."""

import os
import time

import numpy as np
import pytest

from infodiffusion_tpu.data.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _make_images(tmp_path, n=8, w=178, h=218):
    from PIL import Image

    rng = np.random.RandomState(0)
    files = []
    for i in range(n):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"{i:03d}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        files.append(str(p))
    # one PNG to exercise the PNG path
    p = tmp_path / "z.png"
    Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
    files.append(str(p))
    return files


def test_native_decode_matches_pil_within_tolerance(tmp_path):
    from infodiffusion_tpu.data.datasets import ImageFolderDataset
    from infodiffusion_tpu.data.native import NativeImageBatcher

    files = _make_images(tmp_path)
    nat = NativeImageBatcher(files, 64, center_crop=True, d2c=False)
    got = nat.decode(np.arange(len(files)))
    assert got.shape == (len(files), 64, 64, 3)

    ds = ImageFolderDataset(files=files, size=64, center_crop=True)
    ds._native_tried = True  # force PIL path
    want01 = ds.get_batch(np.arange(len(files)))[0]
    want = ((want01 + 1) / 2 * 255).astype(np.float64)
    # same antialiased triangle filter as PIL: agreement to rounding
    diff = np.abs(got.astype(np.float64) - want)
    assert diff.mean() < 0.5
    assert diff.max() <= 2.0


def test_native_d2c_and_plain_resize(tmp_path):
    from infodiffusion_tpu.data.native import NativeImageBatcher

    files = _make_images(tmp_path, n=3)
    for kwargs in (dict(center_crop=False, d2c=True),
                   dict(center_crop=False, d2c=False)):
        nat = NativeImageBatcher(files, 32, **kwargs)
        out = nat.decode(np.arange(3))
        assert out.shape == (3, 32, 32, 3)
        assert out.std() > 1.0  # actually decoded something


def test_native_bad_index_raises(tmp_path):
    from infodiffusion_tpu.data.native import NativeImageBatcher

    files = _make_images(tmp_path, n=2)
    nat = NativeImageBatcher(files, 32, center_crop=True, d2c=False)
    with pytest.raises(IOError):
        nat.decode(np.asarray([0, 99]))


def test_native_faster_than_pil(tmp_path):
    """Thread-pooled native decode should beat single-threaded PIL on a
    batch (smoke-level perf assertion, generous margin)."""
    from infodiffusion_tpu.data.datasets import ImageFolderDataset
    from infodiffusion_tpu.data.native import NativeImageBatcher

    files = _make_images(tmp_path, n=32)
    idx = np.arange(32)

    nat = NativeImageBatcher(files, 64, center_crop=True, d2c=False)
    nat.decode(idx)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        nat.decode(idx)
    t_native = time.perf_counter() - t0

    ds = ImageFolderDataset(files=files, size=64, center_crop=True)
    ds._native_tried = True
    t0 = time.perf_counter()
    for _ in range(3):
        ds.get_batch(idx)
    t_pil = time.perf_counter() - t0
    assert t_native < t_pil * 1.5  # typically several x faster


def test_native_png_writer_roundtrip(tmp_path):
    from PIL import Image

    from infodiffusion_tpu.data.native import write_png_batch

    rng = np.random.RandomState(0)
    batch = rng.randint(0, 255, (6, 16, 16, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"w{i}.png") for i in range(6)]
    assert write_png_batch(paths, batch)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(np.asarray(Image.open(p)), batch[i])
    # grayscale
    g = rng.randint(0, 255, (2, 8, 8, 1), dtype=np.uint8)
    gp = [str(tmp_path / f"g{i}.png") for i in range(2)]
    assert write_png_batch(gp, g)
    np.testing.assert_array_equal(np.asarray(Image.open(gp[1])), g[1, :, :, 0])


def test_native_corrupt_images_raise_not_crash(tmp_path):
    """Corrupt inputs in a production data dir must surface as a Python
    IOError naming the failure count — never a process crash (the C++
    decoder traps libjpeg/libpng fatal errors via setjmp and zero-fills
    the failed slot)."""
    from infodiffusion_tpu.data.native import NativeImageBatcher

    files = _make_images(tmp_path, n=2)
    # truncated JPEG: valid header, body cut off
    good = open(files[0], "rb").read()
    trunc = tmp_path / "trunc.jpg"
    trunc.write_bytes(good[: len(good) // 4])
    # pure garbage with a .png name
    garbage = tmp_path / "garbage.png"
    garbage.write_bytes(b"\x00\x01notanimage" * 64)
    # empty file
    empty = tmp_path / "empty.jpg"
    empty.write_bytes(b"")

    bad = files + [str(trunc), str(garbage), str(empty)]
    nat = NativeImageBatcher(bad, 32, center_crop=True, d2c=False)
    with pytest.raises(IOError, match="failed to decode"):
        nat.decode(np.arange(len(bad)))
    # the batcher object survives and still decodes clean batches
    out = nat.decode(np.arange(2))
    assert out.shape == (2, 32, 32, 3)
    assert out.std() > 1.0


def test_native_rgba_png_drops_alpha_like_pil(tmp_path):
    """RGBA PNGs: the native decoder must DROP the alpha channel like
    PIL's convert('RGB') — compositing onto a background would make the
    two loader paths produce different training data."""
    from PIL import Image

    from infodiffusion_tpu.data.native import NativeImageBatcher

    rng = np.random.RandomState(0)
    rgba = rng.randint(0, 255, (64, 64, 4), dtype=np.uint8)
    rgba[..., 3] = 128  # semi-transparent everywhere
    p = tmp_path / "a.png"
    Image.fromarray(rgba, "RGBA").save(p)
    nat = NativeImageBatcher([str(p)], 64, center_crop=False, d2c=False)
    got = nat.decode(np.arange(1))[0]
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_native_cmyk_jpeg_retried_through_pil(tmp_path):
    """CMYK JPEGs fail libjpeg's RGB conversion; the dataset layer must
    transparently retry them through PIL instead of aborting the run."""
    from PIL import Image

    from infodiffusion_tpu.data.datasets import ImageFolderDataset

    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (96, 96, 3), dtype=np.uint8)
    p = tmp_path / "cmyk.jpg"
    Image.fromarray(rgb).convert("CMYK").save(p, quality=95)
    ds = ImageFolderDataset(files=[str(p)], size=64, center_crop=False)
    x, _ = ds.get_batch(np.arange(1))
    assert x.shape == (1, 64, 64, 3)
    # real pixels, not a zero-filled failure slot
    assert np.abs(x).mean() > 0.05


def test_native_truncated_jpeg_detected(tmp_path):
    """A truncated JPEG decodes 'successfully' with garbage fill unless
    the decoder checks libjpeg's corrupt-data warnings — it must be
    counted as a failed slot, matching PIL (which raises)."""
    from infodiffusion_tpu.data.native import NativeImageBatcher

    files = _make_images(tmp_path, n=1)
    good = open(files[0], "rb").read()
    trunc = tmp_path / "t.jpg"
    trunc.write_bytes(good[: int(len(good) * 0.6)])
    nat = NativeImageBatcher([str(trunc)], 64, center_crop=True, d2c=False)
    _, failed = nat.decode_with_failures(np.arange(1))
    assert list(failed) == [0]


def test_native_center_crop_half_boundary_dims_match_pil(tmp_path):
    """At exact .5 resize boundaries the native path must round like
    Python's round() (half-even) so both loader paths produce identical
    dimensions — 128x129 at size 64 hits scale 0.5 exactly."""
    from PIL import Image

    from infodiffusion_tpu.data.datasets import ImageFolderDataset

    rng = np.random.RandomState(2)
    p = tmp_path / "hb.png"
    Image.fromarray(
        rng.randint(0, 255, (129, 128, 3), dtype=np.uint8)
    ).save(p)
    nat_ds = ImageFolderDataset(files=[str(p)], size=64, center_crop=True)
    x_nat, _ = nat_ds.get_batch(np.arange(1))
    pil_ds = ImageFolderDataset(files=[str(p)], size=64, center_crop=True)
    pil_ds._native_tried = True  # force PIL path
    x_pil, _ = pil_ds.get_batch(np.arange(1))
    diff = np.abs(x_nat - x_pil) * 127.5  # back to u8 scale
    assert diff.mean() < 0.5 and diff.max() <= 2.0
