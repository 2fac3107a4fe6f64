"""Dataset packing CLI (reference `dataset_tool.py:110-618`).

convert: any supported source -> uncompressed-PNG zip (or folder) with a
`dataset.json` label index.  Sources (reference `open_dataset`,
dataset_tool.py:257-271): image folder, image zip, LSUN lmdb directory
(`*_lmdb`), `cifar-10-python.tar.gz`, and `train-images-idx3-ubyte.gz`
(MNIST).  Transforms (reference `make_transform`, dataset_tool.py:201-249):
plain scale, center-crop, center-crop-wide.  convert-by-txts: multi-root txt
pair lists filtered by the "train half front" tags, 512 layout.

  python -m pasta_gan_tpu.cli.dataset_tool convert --source ./imgs --dest out.zip
  python -m pasta_gan_tpu.cli.dataset_tool convert --source cifar-10-python.tar.gz \
      --dest cifar.zip --transform center-crop --width 32 --height 32
"""

from __future__ import annotations

import argparse
import gzip
import io
import json
import os
import pickle
import tarfile
import zipfile


def _iter_image_blobs(source: str):
    exts = (".png", ".jpg", ".jpeg")
    if os.path.isdir(source):
        for root, _, files in sorted(os.walk(source)):
            for f in sorted(files):
                if f.lower().endswith(exts):
                    full = os.path.join(root, f)
                    yield os.path.relpath(full, source), open(full, "rb").read()
    else:
        with zipfile.ZipFile(source) as z:
            for name in sorted(z.namelist()):
                if name.lower().endswith(exts):
                    yield name, z.read(name)


def _iter_folder_or_zip(source: str):
    import numpy as np
    import PIL.Image

    for rel, blob in _iter_image_blobs(source):
        img = np.asarray(PIL.Image.open(io.BytesIO(blob)).convert("RGB"))
        yield rel, img, None


def _iter_cifar10(tarball: str):
    """cifar-10-python.tar.gz: five pickled train batches of [N, 3072] u8
    (reference open_cifar10, dataset_tool.py:138-167)."""
    import numpy as np

    with tarfile.open(tarball, "r:gz") as tar:
        for batch in range(1, 6):
            member = tar.getmember(f"cifar-10-batches-py/data_batch_{batch}")
            with tar.extractfile(member) as f:
                data = pickle.load(f, encoding="latin1")
            imgs = np.asarray(data["data"], np.uint8).reshape(-1, 3, 32, 32)
            imgs = imgs.transpose(0, 2, 3, 1)  # NCHW -> NHWC
            for img, label in zip(imgs, data["labels"]):
                yield None, img, int(label)


def _iter_mnist(images_gz: str):
    """train-images-idx3-ubyte.gz (+ sibling labels): 28x28 u8 padded to
    32x32 (reference open_mnist, dataset_tool.py:171-197)."""
    import numpy as np

    labels_gz = images_gz.replace("-images-idx3-ubyte.gz", "-labels-idx1-ubyte.gz")
    with gzip.open(images_gz, "rb") as f:
        images = np.frombuffer(f.read(), np.uint8, offset=16).reshape(-1, 28, 28)
    with gzip.open(labels_gz, "rb") as f:
        labels = np.frombuffer(f.read(), np.uint8, offset=8)
    images = np.pad(images, [(0, 0), (2, 2), (2, 2)], "constant")
    for img, label in zip(images, labels):
        yield None, img, int(label)


def _iter_lmdb(lmdb_dir: str):
    """LSUN lmdb directory of encoded image values (reference open_lmdb,
    dataset_tool.py:110-135).  Needs the optional `lmdb` package."""
    import numpy as np
    import PIL.Image

    try:
        import lmdb  # not in the baked image; gate, don't fail at import time
    except ImportError as e:
        raise SystemExit(
            "lmdb sources need the 'lmdb' package (pip install lmdb)"
        ) from e

    with lmdb.open(lmdb_dir, readonly=True, lock=False).begin(write=False) as txn:
        for _key, value in txn.cursor():
            try:
                img = np.asarray(PIL.Image.open(io.BytesIO(value)).convert("RGB"))
            except Exception as e:  # undecodable entry: skip, as the reference does
                print(f"skipping lmdb entry: {e}")
                continue
            yield None, img, None


def open_source(source: str):
    """Pick the sample iterator for a source path (reference open_dataset)."""
    if os.path.isdir(source):
        if source.rstrip("/").endswith("_lmdb"):
            return _iter_lmdb(source)
        return _iter_folder_or_zip(source)
    base = os.path.basename(source)
    if base == "cifar-10-python.tar.gz":
        return _iter_cifar10(source)
    if base.endswith("-images-idx3-ubyte.gz"):
        return _iter_mnist(source)
    if source.lower().endswith(".zip"):
        return _iter_folder_or_zip(source)
    raise SystemExit(f"unsupported source {source}")


def make_transform(transform, width, height, resize_filter="lanczos"):
    """none (plain scale) / center-crop / center-crop-wide; a transform may
    return None to drop the image (reference make_transform)."""
    import numpy as np
    import PIL.Image

    resample = {"box": PIL.Image.BOX, "lanczos": PIL.Image.LANCZOS}[resize_filter]

    def scale(img):
        h, w = img.shape[:2]
        ww, hh = width or w, height or h
        if (ww, hh) == (w, h):
            return img
        return np.asarray(PIL.Image.fromarray(img).resize((ww, hh), resample))

    def center_crop(img):
        crop = min(img.shape[:2])
        img = img[
            (img.shape[0] - crop) // 2 : (img.shape[0] + crop) // 2,
            (img.shape[1] - crop) // 2 : (img.shape[1] + crop) // 2,
        ]
        return np.asarray(PIL.Image.fromarray(img).resize((width, height), resample))

    def center_crop_wide(img):
        ch = int(np.round(width * img.shape[0] / img.shape[1]))
        if img.shape[1] < width or ch < height:
            return None  # too small: dropped
        img = img[(img.shape[0] - ch) // 2 : (img.shape[0] + ch) // 2]
        img = np.asarray(PIL.Image.fromarray(img).resize((width, height), resample))
        canvas = np.zeros([width, width, 3], dtype=np.uint8)
        canvas[(width - height) // 2 : (width + height) // 2, :] = img
        return canvas

    if transform is None:
        return scale
    if transform == "center-crop":
        if not (width and height):
            raise SystemExit("--width/--height required for center-crop")
        return center_crop
    if transform == "center-crop-wide":
        if not (width and height):
            raise SystemExit("--width/--height required for center-crop-wide")
        return center_crop_wide
    raise SystemExit(f"unknown transform {transform}")


class _Writer:
    def __init__(self, dest: str):
        self.is_zip = dest.lower().endswith(".zip")
        self.dest = dest
        if self.is_zip:
            self.zf = zipfile.ZipFile(dest, "w", compression=zipfile.ZIP_STORED)
        else:
            os.makedirs(dest, exist_ok=True)

    def write(self, name: str, data: bytes):
        if self.is_zip:
            self.zf.writestr(name, data)
        else:
            path = os.path.join(self.dest, name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            open(path, "wb").write(data)

    def close(self, labels):
        meta = json.dumps({"labels": labels if labels else None})
        if self.is_zip:
            self.zf.writestr("dataset.json", meta)
            self.zf.close()
        else:
            open(os.path.join(self.dest, "dataset.json"), "w").write(meta)


def convert_dataset(source: str, dest: str, resolution=None, max_images=None,
                    labels_path=None, transform=None, width=None, height=None,
                    resize_filter="lanczos"):
    import PIL.Image

    if resolution is not None and width is None:
        # square shorthand: crop-then-resize (the tool's historical behavior)
        width = height = resolution
        transform = transform or "center-crop"
    tf = make_transform(transform, width, height, resize_filter)

    file_labels = {}
    if labels_path and os.path.exists(labels_path):
        file_labels = dict(json.load(open(labels_path)).get("labels") or [])

    writer = _Writer(dest)
    out_labels = []
    count = 0
    for rel, img, label in open_source(source):
        if max_images is not None and count >= max_images:
            break
        img = tf(img)
        if img is None:
            continue
        arch_name = f"{count // 1000:05d}/img{count:08d}.png"
        buf = io.BytesIO()
        PIL.Image.fromarray(img).save(buf, format="png", compress_level=0, optimize=False)
        writer.write(arch_name, buf.getvalue())
        if label is not None:
            out_labels.append([arch_name, label])
        elif rel in file_labels:
            out_labels.append([arch_name, file_labels[rel]])
        count += 1
    # labels must cover every image or none (reference dataset_tool.py:88-96)
    writer.close(out_labels if len(out_labels) == count else [])
    print(f"packed {count} images -> {dest}")
    return count


def convert_dataset_load_by_txts(sources, dest, txt_name="train_pairs_front_list_0508.txt",
                                 tags=("train", "half", "front"), resolution=None):
    """Multi-root txt lists filtered by tags (reference dataset_tool.py:458-618)."""
    import numpy as np
    import PIL.Image

    writer = _Writer(dest)
    count = 0
    for root in sources:
        txt = os.path.join(root, txt_name)
        if not os.path.exists(txt):
            continue
        for line in open(txt):
            parts = line.strip().split()
            if not parts:
                continue
            if len(parts) > 1 and tags and not all(t in line for t in tags):
                continue
            fname = os.path.join(root, "image", parts[0])
            if not os.path.exists(fname):
                continue
            img = np.asarray(PIL.Image.open(fname).convert("RGB"))
            if resolution is not None:
                img = make_transform("center-crop", resolution, resolution)(img)
            arch_name = f"{count // 1000:05d}/img{count:08d}.png"
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png", compress_level=0)
            writer.write(arch_name, buf.getvalue())
            count += 1
    writer.close([])
    print(f"packed {count} images -> {dest}")
    return count


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="pack an image folder/zip/lmdb/cifar/mnist source")
    c.add_argument("--source", required=True)
    c.add_argument("--dest", required=True)
    c.add_argument("--resolution", type=int, default=None,
                   help="square output size: center-crop then resize "
                   "(the reference tool's historical behavior; pass "
                   "--transform to pick another)")
    c.add_argument("--max-images", type=int, default=None)
    c.add_argument("--labels", default=None)
    c.add_argument("--transform", choices=["center-crop", "center-crop-wide"], default=None)
    c.add_argument("--width", type=int, default=None)
    c.add_argument("--height", type=int, default=None)
    c.add_argument("--resize-filter", choices=["box", "lanczos"], default="lanczos")

    t = sub.add_parser("convert-by-txts", help="pack via txt pair lists")
    t.add_argument("--sources", nargs="+", required=True)
    t.add_argument("--dest", required=True)
    t.add_argument("--resolution", type=int, default=None)

    args = p.parse_args(argv)
    if args.cmd == "convert":
        convert_dataset(args.source, args.dest, args.resolution, args.max_images,
                        args.labels, args.transform, args.width, args.height,
                        args.resize_filter)
    else:
        convert_dataset_load_by_txts(args.sources, args.dest, resolution=args.resolution)


if __name__ == "__main__":
    main()
