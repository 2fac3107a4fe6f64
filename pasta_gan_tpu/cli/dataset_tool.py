"""Dataset packing CLI (reference `dataset_tool.py:315-618`).

convert_dataset: folder/zip of images -> uncompressed-PNG zip (or folder) with
a `dataset.json` label index.  convert_dataset_load_by_txts: multi-root txt
pair lists filtered by the "train half front" tags, 512 layout.

  python -m pasta_gan_tpu.cli.dataset_tool convert --source ./imgs --dest out.zip
"""

from __future__ import annotations

import argparse
import io
import json
import os
import zipfile


def _iter_images(source: str):
    exts = (".png", ".jpg", ".jpeg")
    if os.path.isdir(source):
        for root, _, files in sorted(os.walk(source)):
            for f in sorted(files):
                if f.lower().endswith(exts):
                    full = os.path.join(root, f)
                    yield os.path.relpath(full, source), open(full, "rb").read()
    elif source.lower().endswith(".zip"):
        with zipfile.ZipFile(source) as z:
            for name in sorted(z.namelist()):
                if name.lower().endswith(exts):
                    yield name, z.read(name)
    else:
        raise SystemExit(f"unsupported source {source}")


def _center_crop(img, width, height):
    import numpy as np

    h, w = img.shape[:2]
    crop = min(h, w)
    img = img[(h - crop) // 2 : (h + crop) // 2, (w - crop) // 2 : (w + crop) // 2]
    import PIL.Image

    return np.asarray(PIL.Image.fromarray(img).resize((width, height), PIL.Image.LANCZOS))


def convert_dataset(source: str, dest: str, resolution=None, max_images=None, labels_path=None):
    import numpy as np
    import PIL.Image

    labels = {}
    if labels_path and os.path.exists(labels_path):
        labels = dict(json.load(open(labels_path)).get("labels") or [])

    is_zip = dest.lower().endswith(".zip")
    if is_zip:
        zf = zipfile.ZipFile(dest, "w", compression=zipfile.ZIP_STORED)
    else:
        os.makedirs(dest, exist_ok=True)

    out_labels = []
    count = 0
    for rel, blob in _iter_images(source):
        if max_images is not None and count >= max_images:
            break
        img = np.asarray(PIL.Image.open(io.BytesIO(blob)).convert("RGB"))
        if resolution is not None:
            w, h = (resolution, resolution) if isinstance(resolution, int) else resolution
            img = _center_crop(img, w, h)
        arch_name = f"{count // 1000:05d}/img{count:08d}.png"
        buf = io.BytesIO()
        PIL.Image.fromarray(img).save(buf, format="png", compress_level=0, optimize=False)
        if is_zip:
            zf.writestr(arch_name, buf.getvalue())
        else:
            path = os.path.join(dest, arch_name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            open(path, "wb").write(buf.getvalue())
        if rel in labels:
            out_labels.append([arch_name, labels[rel]])
        count += 1

    meta = json.dumps({"labels": out_labels if out_labels else None})
    if is_zip:
        zf.writestr("dataset.json", meta)
        zf.close()
    else:
        open(os.path.join(dest, "dataset.json"), "w").write(meta)
    print(f"packed {count} images -> {dest}")
    return count


def convert_dataset_load_by_txts(sources, dest, txt_name="train_pairs_front_list_0508.txt",
                                 tags=("train", "half", "front"), resolution=None):
    """Multi-root txt lists filtered by tags (reference dataset_tool.py:458-618)."""
    import numpy as np
    import PIL.Image

    is_zip = dest.lower().endswith(".zip")
    zf = zipfile.ZipFile(dest, "w", compression=zipfile.ZIP_STORED) if is_zip else None
    if not is_zip:
        os.makedirs(dest, exist_ok=True)
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
                img = _center_crop(img, resolution, resolution)
            arch_name = f"{count // 1000:05d}/img{count:08d}.png"
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png", compress_level=0)
            if is_zip:
                zf.writestr(arch_name, buf.getvalue())
            else:
                p = os.path.join(dest, arch_name)
                os.makedirs(os.path.dirname(p), exist_ok=True)
                open(p, "wb").write(buf.getvalue())
            count += 1
    if is_zip:
        zf.writestr("dataset.json", json.dumps({"labels": None}))
        zf.close()
    print(f"packed {count} images -> {dest}")
    return count


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="pack a folder/zip of images")
    c.add_argument("--source", required=True)
    c.add_argument("--dest", required=True)
    c.add_argument("--resolution", type=int, default=None)
    c.add_argument("--max-images", type=int, default=None)
    c.add_argument("--labels", default=None)

    t = sub.add_parser("convert-by-txts", help="pack via txt pair lists")
    t.add_argument("--sources", nargs="+", required=True)
    t.add_argument("--dest", required=True)
    t.add_argument("--resolution", type=int, default=None)

    args = p.parse_args(argv)
    if args.cmd == "convert":
        convert_dataset(args.source, args.dest, args.resolution, args.max_images, args.labels)
    else:
        convert_dataset_load_by_txts(args.sources, args.dest, resolution=args.resolution)


if __name__ == "__main__":
    main()
