"""Real-dataset file-format readers, tested against generated fixtures."""

import gzip
import os
import pickle
import struct

import numpy as np

from tpugan.data.datasets import load_dataset


def _write_idx_images(path, arr):
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000803))  # magic: ubyte, 3 dims
        f.write(struct.pack(">3I", *arr.shape))
        f.write(arr.tobytes())


def _write_idx_labels(path, arr):
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000801))
        f.write(struct.pack(">I", arr.shape[0]))
        f.write(arr.tobytes())


def test_mnist_idx_reader(tmp_path, rng):
    imgs = rng.integers(0, 256, size=(10, 28, 28)).astype(np.uint8)
    labels = rng.integers(0, 10, size=10).astype(np.uint8)
    _write_idx_images(str(tmp_path / "train-images-idx3-ubyte.gz"), imgs)
    _write_idx_labels(str(tmp_path / "train-labels-idx1-ubyte.gz"), labels)
    data = load_dataset("mnist", str(tmp_path), image_size=28, channels=1)
    assert data["images"].shape == (10, 28, 28, 1)
    np.testing.assert_array_equal(data["images"][..., 0], imgs)
    np.testing.assert_array_equal(data["labels"], labels.astype(np.int32))


def test_mnist_honors_requested_geometry(tmp_path, rng):
    """image_size/channels are the model's geometry (the reference's
    torchvision Resize/Grayscale transforms): mnist at 64px must resize —
    not silently hand a 28px real batch to a 64px discriminator."""
    imgs = rng.integers(0, 256, size=(6, 28, 28)).astype(np.uint8)
    _write_idx_images(str(tmp_path / "train-images-idx3-ubyte.gz"), imgs)
    data = load_dataset("mnist", str(tmp_path), image_size=64, channels=1)
    assert data["images"].shape == (6, 64, 64, 1)
    assert data["images"].dtype == np.uint8
    # channel tiling: the classic mnist-as-RGB config
    data3 = load_dataset("mnist", str(tmp_path), image_size=32, channels=3)
    assert data3["images"].shape == (6, 32, 32, 3)
    np.testing.assert_array_equal(data3["images"][..., 0],
                                  data3["images"][..., 2])


def test_cifar10_pickle_reader(tmp_path, rng):
    root = tmp_path / "cifar-10-batches-py"
    os.makedirs(root)
    all_imgs, all_labels = [], []
    for i in range(1, 6):
        x = rng.integers(0, 256, size=(4, 3072)).astype(np.uint8)
        y = list(rng.integers(0, 10, size=4))
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": x, b"labels": y}, f)
        all_imgs.append(x)
        all_labels.extend(y)
    data = load_dataset("cifar10", str(tmp_path), image_size=32, channels=3)
    assert data["images"].shape == (20, 32, 32, 3)
    expect = np.concatenate(all_imgs).reshape(-1, 3, 32, 32)
    expect = expect.transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(data["images"], expect)
    np.testing.assert_array_equal(data["labels"],
                                  np.asarray(all_labels, np.int32))


def test_celeba_folder_reader(tmp_path, rng):
    from PIL import Image

    root = tmp_path / "img_align_celeba"
    os.makedirs(root)
    for i in range(3):
        arr = rng.integers(0, 256, size=(218, 178, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"{i:06d}.jpg")
    data = load_dataset("celeba", str(tmp_path), image_size=64, channels=3)
    assert data["images"].shape == (3, 64, 64, 3)
    assert data["images"].dtype == np.uint8
    # labels default to zeros when no attr file is present
    np.testing.assert_array_equal(data["labels"], np.zeros(3, np.int32))


def test_celeba_attr_labels(tmp_path, rng):
    from PIL import Image

    root = tmp_path / "img_align_celeba"
    os.makedirs(root)
    names = [f"{i:06d}.jpg" for i in range(2)]
    for n in names:
        Image.fromarray(
            rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
        ).save(root / n)
    with open(tmp_path / "list_attr_celeba.txt", "w") as f:
        f.write("2\nSmiling Male Young\n")
        f.write(f"{names[0]} -1 1 -1\n")
        f.write(f"{names[1]} 1 -1 1\n")
    data = load_dataset("celeba", str(tmp_path), image_size=32, channels=3)
    np.testing.assert_array_equal(data["labels"], [1, 0])
