"""dataset_tool CLI: sources (folder/zip/cifar/mnist), transforms, labels."""

import gzip
import io
import json
import os
import pickle
import tarfile
import zipfile

import numpy as np
import PIL.Image
import pytest

from pasta_gan_tpu.cli.dataset_tool import convert_dataset, make_transform, main


def _write_images(d, n=5, hw=(48, 64)):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        name = f"im{i:03d}.png"
        PIL.Image.fromarray(img).save(os.path.join(d, name))
        names.append(name)
    return names


def _zip_images(zf_path):
    imgs = np.arange(2 * 32 * 32 * 3, dtype=np.uint8).reshape(2, 32, 32, 3)
    with zipfile.ZipFile(zf_path, "w") as z:
        for i, im in enumerate(imgs):
            buf = io.BytesIO()
            PIL.Image.fromarray(im).save(buf, format="png")
            z.writestr(f"a/{i}.png", buf.getvalue())


def test_convert_folder_with_labels_and_crop(tmp_path):
    src = tmp_path / "src"
    names = _write_images(str(src))
    labels = {"labels": [[n, i] for i, n in enumerate(names)]}
    lp = tmp_path / "labels.json"
    lp.write_text(json.dumps(labels))

    dest = tmp_path / "out.zip"
    n = convert_dataset(str(src), str(dest), resolution=32, labels_path=str(lp))
    assert n == 5
    with zipfile.ZipFile(dest) as z:
        meta = json.loads(z.read("dataset.json"))
        assert len(meta["labels"]) == 5
        img = PIL.Image.open(io.BytesIO(z.read(meta["labels"][0][0])))
        assert img.size == (32, 32)


def test_convert_zip_source_scale_default(tmp_path):
    src = tmp_path / "in.zip"
    _zip_images(str(src))
    dest = tmp_path / "outdir"
    n = convert_dataset(str(src), str(dest))
    assert n == 2
    meta = json.loads((dest / "dataset.json").read_text())
    assert meta["labels"] is None
    assert os.path.exists(dest / "00000" / "img00000000.png")


def test_cifar10_source(tmp_path):
    # synthetic cifar-10-python.tar.gz with 5 x 4-image batches
    tarball = tmp_path / "cifar-10-python.tar.gz"
    rng = np.random.default_rng(1)
    with tarfile.open(tarball, "w:gz") as tar:
        for b in range(1, 6):
            data = {
                "data": rng.integers(0, 255, (4, 3072), dtype=np.uint8)
                .astype(np.uint8),
                "labels": [int(x) for x in rng.integers(0, 10, 4)],
            }
            blob = pickle.dumps(data)
            info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{b}")
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))

    dest = tmp_path / "cifar.zip"
    n = convert_dataset(str(tarball), str(dest), max_images=12)
    assert n == 12
    with zipfile.ZipFile(dest) as z:
        meta = json.loads(z.read("dataset.json"))
        assert len(meta["labels"]) == 12  # labels come from the batches
        img = PIL.Image.open(io.BytesIO(z.read(meta["labels"][0][0])))
        assert img.size == (32, 32)


def test_mnist_source(tmp_path):
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (6, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, 6).astype(np.uint8)
    ip = tmp_path / "train-images-idx3-ubyte.gz"
    lp = tmp_path / "train-labels-idx1-ubyte.gz"
    with gzip.open(ip, "wb") as f:
        f.write(b"\x00" * 16 + imgs.tobytes())
    with gzip.open(lp, "wb") as f:
        f.write(b"\x00" * 8 + labels.tobytes())

    dest = tmp_path / "mnist"
    n = convert_dataset(str(ip), str(dest))
    assert n == 6
    meta = json.loads((dest / "dataset.json").read_text())
    assert [l for _, l in meta["labels"]] == [int(x) for x in labels]
    img = np.asarray(PIL.Image.open(dest / meta["labels"][0][0]))
    assert img.shape == (32, 32)  # 28x28 padded by 2
    np.testing.assert_array_equal(img[2:30, 2:30], imgs[0])
    assert img[:2].max() == 0


def test_center_crop_wide_drops_small_and_pads():
    tf = make_transform("center-crop-wide", 64, 32)
    small = np.zeros((16, 16, 3), np.uint8)
    assert tf(small) is None
    wide = np.full((64, 128, 3), 200, np.uint8)
    out = tf(wide)
    assert out.shape == (64, 64, 3)
    assert out[:16].max() == 0 and out[-16:].max() == 0  # canvas bands
    assert out[16:48].min() > 0


def test_cli_entrypoint(tmp_path):
    src = tmp_path / "src"
    _write_images(str(src), n=2)
    dest = tmp_path / "o.zip"
    main(["convert", "--source", str(src), "--dest", str(dest),
          "--transform", "center-crop", "--width", "24", "--height", "24"])
    with zipfile.ZipFile(dest) as z:
        assert len([n for n in z.namelist() if n.endswith(".png")]) == 2
