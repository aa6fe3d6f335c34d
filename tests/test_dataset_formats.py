"""File-format loader tests with generated on-disk fixtures: MNIST idx,
CIFAR-10 pickle batches, CelebA folder with attr/partition files,
dsprites npz (reference layouts; data.py)."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from infodiffusion_tpu.config import Config
from infodiffusion_tpu.data.datasets import (
    _load_celeba,
    _load_cifar10,
    _load_dsprites,
    _load_mnist_like,
    _read_idx,
)


def _write_idx_images(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000803))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def _write_idx_labels(path, arr, gz=False):
    op = gzip.open if gz else open
    with op(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000801))
        f.write(struct.pack(">I", arr.shape[0]))
        f.write(arr.tobytes())


def test_mnist_idx_loader(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (10, 28, 28), dtype=np.uint8)
    labels = rng.randint(0, 10, (10,)).astype(np.uint8)
    _write_idx_images(raw / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(raw / "train-labels-idx1-ubyte.gz", labels, gz=True)

    ds = _load_mnist_like(str(tmp_path), "mnist", 32)
    assert ds.images.shape == (10, 32, 32, 1)  # resized 28 -> 32
    np.testing.assert_array_equal(ds.attrs, labels.astype(np.int32))
    x, a = ds.get_batch(np.arange(4))
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_read_idx_gzip_roundtrip(tmp_path):
    arr = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    _write_idx_images(tmp_path / "x", arr)
    np.testing.assert_array_equal(_read_idx(str(tmp_path / "x")), arr)


def test_cifar10_pickle_loader(tmp_path):
    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.RandomState(1)
    for i in range(1, 6):
        data = rng.randint(0, 255, (4, 3072), dtype=np.uint8)
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": [0, 1, 2, 3]}, f)
    ds = _load_cifar10(str(tmp_path))
    assert ds.images.shape == (20, 32, 32, 3)
    assert ds.attrs.shape == (20,)


def test_celeba_folder_attrs_and_split(tmp_path):
    from PIL import Image

    root = tmp_path / "celeba"
    imdir = root / "img_align_celeba"
    imdir.mkdir(parents=True)
    names = [f"{i:06d}.jpg" for i in range(1, 7)]
    for n in names:
        Image.new("RGB", (178, 218), (10, 20, 30)).save(imdir / n)
    # 40 attrs per file (+1/-1 coded like the real file)
    with open(root / "list_attr_celeba.txt", "w") as f:
        f.write("6\n")
        f.write(" ".join(f"A{i}" for i in range(40)) + "\n")
        for j, n in enumerate(names):
            vals = ["1" if (i + j) % 2 == 0 else "-1" for i in range(40)]
            f.write(n + " " + " ".join(vals) + "\n")
    # partition: first 4 train, then valid/test
    with open(root / "list_eval_partition.txt", "w") as f:
        for j, n in enumerate(names):
            f.write(f"{n} {0 if j < 4 else (1 if j == 4 else 2)}\n")

    cfg = Config(dataset="celeba", data_dir=str(tmp_path)).with_dataset_config()
    ds = _load_celeba(cfg)  # always the train split (PARITY.md D17)
    assert len(ds) == 4  # train split only
    assert ds.attrs.shape == (4, 40)
    assert set(np.unique(ds.attrs)) <= {0, 1}  # -1/+1 -> 0/1
    x, a = ds.get_batch(np.arange(2))
    assert x.shape == (2, 64, 64, 3)


def test_dsprites_npz_loader(tmp_path):
    root = tmp_path / "dsprites-dataset"
    root.mkdir()
    rng = np.random.RandomState(2)
    imgs = (rng.rand(10, 64, 64) > 0.5).astype(np.uint8)
    np.savez(
        root / "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz",
        imgs=imgs,
        latents_values=rng.rand(10, 6),
        latents_classes=rng.randint(0, 3, (10, 6)),
    )
    ds = _load_dsprites(str(tmp_path), 32)
    assert ds.images.shape == (10, 32, 32, 1)  # subsampled 64 -> 32
    assert ds.normalize == "raw"
    x, a = ds.get_batch(np.arange(3))
    assert set(np.unique(x)) <= {0.0, 1.0}  # raw 0/1 floats
    assert a.shape == (3, 12)
