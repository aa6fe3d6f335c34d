"""Data layer tests: synthetic datasets, loader contract (drop_last,
shuffle, flip, normalization), latent dataset, image folder transforms,
PNG grid writer."""

import os

import numpy as np
import pytest

from infodiffusion_tpu.config import Config
from infodiffusion_tpu.data import (
    ArrayDataset,
    DataLoader,
    ImageFolderDataset,
    LatentDataset,
    get_dataset,
)
from infodiffusion_tpu.data.datasets import dataset_flags
from infodiffusion_tpu.imaging import make_grid, save_image


def _cfg(**kw):
    base = dict(dataset="mnist", data_dir="synthetic")
    base.update(kw)
    return Config(**base).with_dataset_config()


def test_synthetic_shapes_per_dataset():
    for name in ["mnist", "celeba", "cifar10", "dsprites"]:
        cfg = _cfg(dataset=name)
        ds = get_dataset(cfg)
        x, a = ds.get_batch(np.arange(4))
        assert x.shape == (4, cfg.input_size, cfg.input_size,
                           cfg.input_channels)


def test_loader_drop_last_and_normalization():
    ds = ArrayDataset(images=np.full((10, 4, 4, 1), 255, np.uint8))
    dl = DataLoader(ds, batch_size=4)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    b = np.asarray(batches[0])
    np.testing.assert_allclose(b, 1.0)  # 255 -> +1.0
    ds0 = ArrayDataset(images=np.zeros((4, 4, 4, 1), np.uint8))
    b0 = np.asarray(next(iter(DataLoader(ds0, batch_size=4))))
    np.testing.assert_allclose(b0, -1.0)  # 0 -> -1.0


def test_loader_u8_transfer(monkeypatch):
    """The u8 H2D transfer path (device-side pm1 normalize) must match
    the host-normalize path within one ulp of the pre-shift value (XLA
    reciprocal-multiplies the /255; <=1.2e-7 absolute), engage only on
    u8/pm1 datasets, and respect the INFODIFF_HOST_NORMALIZE escape."""
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, size=(12, 4, 4, 3)).astype(np.uint8)
    attrs = rng.randint(0, 2, size=(12, 5)).astype(np.int32)
    ds = ArrayDataset(images=imgs, attrs=attrs)
    assert ds.u8_transfer_ok()

    def batches(with_attrs):
        dl = DataLoader(ds, batch_size=4, flip=True, seed=9,
                        with_attrs=with_attrs)
        return list(dl)

    monkeypatch.delenv("INFODIFF_HOST_NORMALIZE", raising=False)
    u8_out = batches(True)
    monkeypatch.setenv("INFODIFF_HOST_NORMALIZE", "1")
    host_out = batches(True)
    assert len(u8_out) == len(host_out) == 3
    for (xu, au), (xh, ah) in zip(u8_out, host_out):
        xu, xh = np.asarray(xu), np.asarray(xh)
        assert xu.dtype == xh.dtype == np.float32
        np.testing.assert_allclose(xu, xh, rtol=0, atol=1.3e-7)
        np.testing.assert_array_equal(np.asarray(au), np.asarray(ah))
    # float/raw datasets never take the u8 path
    lat = ArrayDataset(images=rng.randn(8, 6).astype(np.float32),
                       normalize="raw")
    assert not lat.u8_transfer_ok()
    monkeypatch.delenv("INFODIFF_HOST_NORMALIZE")
    b = np.asarray(next(iter(DataLoader(lat, batch_size=4))))
    np.testing.assert_array_equal(b, lat.images[:4])


def test_loader_shuffle_determinism_and_flip():
    imgs = np.arange(8 * 4 * 4, dtype=np.uint8).reshape(8, 4, 4, 1)
    ds = ArrayDataset(images=imgs)
    d1 = DataLoader(ds, batch_size=8, shuffle=True, seed=7)
    d2 = DataLoader(ds, batch_size=8, shuffle=True, seed=7)
    np.testing.assert_array_equal(np.asarray(next(iter(d1))),
                                  np.asarray(next(iter(d2))))
    # flip: with seed fixed, some rows flipped horizontally
    df = DataLoader(ds, batch_size=8, flip=True, seed=0)
    bf = np.asarray(next(iter(df)))
    plain = ds.get_batch(np.arange(8))[0]
    flipped = plain[:, :, ::-1, :]
    # atol covers the u8-transfer path's one-ulp reciprocal divergence
    close = lambda a, b: np.allclose(a, b, rtol=0, atol=1.3e-7)
    for i in range(8):
        assert close(bf[i], plain[i]) or close(bf[i], flipped[i])
    assert any(
        close(bf[i], flipped[i]) and not close(bf[i], plain[i])
        for i in range(8)
    )


def test_loader_producer_exception_propagates():
    """A decode failure in the prefetch thread must surface as an
    exception at the iteration site, not a silent hang (the producer
    enqueues the exception; the consumer re-raises)."""

    class BoomDataset:
        def __len__(self):
            return 8

        def get_batch(self, idx):
            raise ValueError("decode failed")

    dl = DataLoader(BoomDataset(), batch_size=4)
    with pytest.raises(ValueError, match="decode failed"):
        list(dl)


def test_flip_mask_consistent_across_process_slices():
    """Multi-host flip determinism: the flip mask is drawn for the
    GLOBAL batch (up front, in __iter__) and each process slices its own
    rows in _assemble, so (a) global row i gets the same flip on every
    host and (b) the multi-host assembly equals the single-host batch
    bit-for-bit."""
    imgs = np.arange(8 * 4 * 4, dtype=np.uint8).reshape(8, 4, 4, 1)
    ds = ArrayDataset(images=imgs)
    idx = np.arange(8)
    mask = np.random.RandomState(3).rand(8) < 0.5
    dl = DataLoader(ds, batch_size=8, flip=True, seed=3)

    full = dl._assemble(idx, np.arange(8), mask)
    p0 = dl._assemble(idx, np.arange(0, 4), mask)   # "process 0" rows
    p1 = dl._assemble(idx, np.arange(4, 8), mask)   # "process 1" rows
    np.testing.assert_array_equal(np.concatenate([p0, p1]), full)


def test_loader_rng_stream_immune_to_abandoned_iteration():
    """Shuffle orders and flip masks are drawn up front in __iter__, so
    an abandoned iteration (the runner peeks one batch to build the
    train state) consumes a FIXED amount of RNG regardless of how far
    the producer prefetched — epoch N's batches are identical whether or
    not earlier epochs were fully consumed. Lazy per-batch draws inside
    the producer thread would make this timing-dependent (and desync
    hosts on a pod)."""
    imgs = np.arange(16 * 4 * 4, dtype=np.uint8).reshape(16, 4, 4, 1)
    ds = ArrayDataset(images=imgs)

    def mk():
        return DataLoader(ds, batch_size=4, shuffle=True, flip=True,
                          seed=5)

    a = mk()
    _epoch1 = [np.asarray(b) for b in a]      # fully consumed
    epoch2_full = [np.asarray(b) for b in a]

    b = mk()
    next(iter(b))                              # peek + abandon
    epoch2_abandoned = [np.asarray(x) for x in b]

    assert len(epoch2_full) == len(epoch2_abandoned) == 4
    for want, got in zip(epoch2_full, epoch2_abandoned):
        np.testing.assert_array_equal(want, got)


def test_loader_fast_forward_aligns_resumed_epochs():
    """--resume data alignment: fast_forward(k) advances the RNG stream
    exactly as k consumed epochs would, so a resumed loader's next epoch
    reproduces the uninterrupted run's epoch k+1 bit-for-bit (shuffle
    order AND flip masks)."""
    imgs = np.arange(16 * 4 * 4, dtype=np.uint8).reshape(16, 4, 4, 1)
    ds = ArrayDataset(images=imgs)

    def mk():
        return DataLoader(ds, batch_size=4, shuffle=True, flip=True,
                          seed=9)

    a = mk()
    for _ in range(2):               # consume epochs 1-2
        list(a)
    epoch3 = [np.asarray(b) for b in a]

    b = mk()
    b.fast_forward(2)
    epoch3_resumed = [np.asarray(x) for x in b]

    assert len(epoch3) == len(epoch3_resumed) == 4
    for want, got in zip(epoch3, epoch3_resumed):
        np.testing.assert_array_equal(want, got)


def test_dsprites_resize_any_input_size(tmp_path):
    """_load_dsprites must nearest-resize to ANY input_size (PARITY.md
    D3), not just the 64->32 halving case — a silent 64px fallthrough
    would contradict every input_size-derived setting downstream."""
    from infodiffusion_tpu.data.datasets import _load_dsprites

    rng = np.random.RandomState(0)
    imgs = (rng.rand(6, 64, 64) < 0.5).astype(np.uint8)
    d = tmp_path / "dsprites-dataset"
    d.mkdir()
    np.savez(
        d / "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz",
        imgs=imgs,
        latents_values=np.ones((6, 6)),
        latents_classes=np.zeros((6, 6), np.int64),
    )
    for size in (16, 32, 64):
        ds = _load_dsprites(str(tmp_path), size)
        assert ds.images.shape == (6, size, size, 1)
        sel = (np.arange(size) * 64 // size).astype(np.int64)
        np.testing.assert_array_equal(
            ds.images[..., 0], imgs[:, sel][:, :, sel]
        )


def test_dataset_flags_table():
    assert dataset_flags("mnist") == (False, False)
    assert dataset_flags("fmnist") == (True, False)
    assert dataset_flags("celeba") == (True, False)
    assert dataset_flags("cifar10") == (True, True)
    assert dataset_flags("ffhq") == (True, False)
    assert dataset_flags("chairs") == (True, True)
    assert dataset_flags("dsprites") == (False, True)


def test_synthetic_dsprites_renders_factors():
    """Synthetic dsprites images must DEPEND on their ground-truth
    factors (factor-dependent sprites, not noise) with the real
    dataset's 12-wide values+classes attr contract — this is what makes
    the representation-learning validation meaningful
    (tools/repr_learning_demo.py)."""
    from infodiffusion_tpu.data.datasets import _render_dsprites

    ds = _render_dsprites(64, 32, np.random.RandomState(0))
    assert ds.images.shape == (64, 32, 32, 1)
    assert ds.images.dtype == np.uint8
    assert set(np.unique(ds.images)) <= {0, 1}
    assert ds.attrs.shape == (64, 12)
    assert ds.normalize == "raw"
    vals = ds.attrs[:, :6]
    assert np.all(vals[:, 0] == 1)                  # color
    assert set(vals[:, 1]) <= {1.0, 2.0, 3.0}       # shape
    assert vals[:, 2].min() >= 0.5 and vals[:, 2].max() <= 1.0  # scale
    # position factors move the sprite: the x-center of mass must track
    # posX (and same for y), i.e. pixels are a function of the factors
    g = (np.arange(32) + 0.5) / 32
    m = ds.images[..., 0].astype(np.float64)
    com_x = (m * g[None, None, :]).sum((1, 2)) / m.sum((1, 2))
    com_y = (m * g[None, :, None]).sum((1, 2)) / m.sum((1, 2))
    assert np.corrcoef(com_x, vals[:, 4])[0, 1] > 0.95
    assert np.corrcoef(com_y, vals[:, 5])[0, 1] > 0.95
    # scale tracks sprite area within each shape class
    area = m.sum((1, 2))
    sq = vals[:, 1] == 1
    assert np.corrcoef(area[sq], vals[sq, 2])[0, 1] > 0.9


def test_synthetic_celeba_renders_attrs():
    """Synthetic celeba images must DEPEND on the first five attr bits
    (shape/posy/size/color/background — all horizontal-flip-invariant),
    with the real 40-attr contract (tools/repr_learning_demo.py's TAD
    counterpart)."""
    from infodiffusion_tpu.data.datasets import _render_celeba

    ds = _render_celeba(64, 64, np.random.RandomState(0))
    assert ds.images.shape == (64, 64, 64, 3)
    assert ds.images.dtype == np.uint8
    assert ds.attrs.shape == (64, 40)
    m = ds.images.astype(np.float64)
    fg = np.abs(m[..., 0] - m[..., 2]) > 30  # colored object pixels
    g = (np.arange(64) + 0.5) / 64
    com_y = np.array(
        [(fg[i] * g[:, None]).sum() / max(fg[i].sum(), 1) for i in range(64)]
    )
    assert np.corrcoef(com_y, ds.attrs[:, 1])[0, 1] > 0.95
    assert np.corrcoef(fg.sum((1, 2)), ds.attrs[:, 2])[0, 1] > 0.9
    rb = np.array(
        [(m[i, ..., 0] - m[i, ..., 2])[fg[i]].mean() for i in range(64)]
    )
    assert np.corrcoef(rb, ds.attrs[:, 3])[0, 1] > 0.95
    bgv = np.array([m[i][~fg[i]].mean() for i in range(64)])
    assert np.corrcoef(bgv, ds.attrs[:, 4])[0, 1] > 0.95


def test_dsprites_raw_normalization():
    ds = ArrayDataset(
        images=np.ones((4, 4, 4, 1), np.uint8), normalize="raw"
    )
    b = np.asarray(next(iter(DataLoader(ds, batch_size=4))))
    np.testing.assert_allclose(b, 1.0)  # raw floats, not scaled


def test_latent_dataset_roundtrip(tmp_path):
    a = np.random.RandomState(0).randn(32, 8).astype(np.float32)
    path = str(tmp_path / "x_latent.npz")
    np.savez(path, all_a=a, all_attr=np.zeros(32))
    ds = LatentDataset(path)
    assert len(ds) == 32
    x, _ = ds.get_batch(np.arange(4))
    np.testing.assert_allclose(x, a[:4])


def test_image_folder_center_crop(tmp_path):
    from PIL import Image

    # celeba-shaped (178x218) image -> resize smaller edge 64 + center crop
    for i in range(3):
        Image.new("RGB", (178, 218), (i * 10, 0, 0)).save(
            tmp_path / f"{i:06d}.jpg"
        )
    ds = ImageFolderDataset(
        files=sorted(str(p) for p in tmp_path.glob("*.jpg")),
        size=64, center_crop=True,
    )
    x, _ = ds.get_batch(np.arange(3))
    assert x.shape == (3, 64, 64, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_save_image_normalizes_before_padding(tmp_path):
    """torchvision order: images are normalized FIRST, then assembled
    with pad_value in OUTPUT space — so the reference's save_image(...,
    normalize=True, range=(-1,1)) grids have BLACK borders, not the
    gray that post-grid normalization of 0.0-padding would produce."""
    from PIL import Image

    batch = np.full((2, 4, 4, 3), -1.0, np.float32)  # all-black images
    p = str(tmp_path / "grid.png")
    save_image(batch, p, nrow=2, normalize=True, value_range=(-1, 1))
    arr = np.asarray(Image.open(p))
    assert arr.max() == 0  # borders AND images black, nothing gray
    # and an empty batch is a clear error, not ZeroDivisionError
    import pytest

    with pytest.raises(ValueError, match="empty batch"):
        make_grid(np.zeros((0, 4, 4, 3), np.float32))


def test_make_grid_and_save_image(tmp_path):
    batch = np.random.RandomState(0).uniform(-1, 1, (6, 8, 8, 1)).astype(np.float32)
    grid = make_grid(batch, nrow=4, padding=2)
    assert grid.shape == (2 * (8 + 2) + 2, 4 * (8 + 2) + 2, 1)
    p = str(tmp_path / "g.png")
    save_image(batch, p, nrow=4, normalize=True, value_range=(-1, 1))
    from PIL import Image

    im = Image.open(p)
    assert im.size == (grid.shape[1], grid.shape[0])
