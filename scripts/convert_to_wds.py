"""Image-folder -> webdataset tar shards (reference
``data/convert_imagenet_to_wds.py`` — HF streaming -> wds.ShardWriter; here
a dependency-free tar writer over an ImageFolder tree, emitting the
(<key>.jpg, <key>.cls) pair layout our WebDatasetReader and the reference
SimpleImageDataset consume).

Usage:
    python scripts/convert_to_wds.py --data_path /data/imagenet/train \
        --output_dir /data/wds --prefix imagenet-train --samples_per_shard 5000
"""

from __future__ import annotations

import argparse
import io
import sys
import tarfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def write_shards(data_path: str, output_dir: str, prefix: str,
                 samples_per_shard: int, reencode_quality: int = 0):
    from imagefolder_tpu.data.imagenet import list_image_folder

    files, labels, _ = list_image_folder(data_path)
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    first = out_dir / f"{prefix}-000000.tar"
    assert not first.exists(), f"{first} already exists"

    def add(tf, name, payload: bytes):
        info = tarfile.TarInfo(name)
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))

    t0 = time.time()
    tf = None
    shard = -1
    for i, (path, label) in enumerate(zip(files, labels)):
        if i % samples_per_shard == 0:
            if tf is not None:
                tf.close()
            shard += 1
            tf = tarfile.open(out_dir / f"{prefix}-{shard:06d}.tar", "w")
            print(f"shard {shard} @ sample {i}", file=sys.stderr)
        key = f"{i:08d}"
        if reencode_quality > 0:
            from PIL import Image

            buf = io.BytesIO()
            Image.open(path).convert("RGB").save(buf, "JPEG",
                                                 quality=reencode_quality)
            payload = buf.getvalue()
            ext = "jpg"
        else:  # pass the original bytes through untouched
            payload = Path(path).read_bytes()
            ext = Path(path).suffix.lstrip(".").lower() or "jpg"
            if ext == "jpeg":
                ext = "jpg"
        add(tf, f"{key}.{ext}", payload)
        add(tf, f"{key}.cls", str(int(label)).encode())
    if tf is not None:
        tf.close()
    n = len(files)
    print(f"wrote {n} samples in {shard + 1} shards "
          f"({time.time() - t0:.1f}s) -> {out_dir}/{prefix}-{{000000.."
          f"{shard:06d}}}.tar")
    return n, shard + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True, help="ImageFolder tree")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--prefix", default="imagenet-train")
    ap.add_argument("--samples_per_shard", type=int, default=5000)
    ap.add_argument("--reencode_quality", type=int, default=0,
                    help=">0: re-encode as JPEG at this quality; default "
                         "passes original bytes through")
    args = ap.parse_args()
    write_shards(args.data_path, args.output_dir, args.prefix,
                 args.samples_per_shard, args.reencode_quality)


if __name__ == "__main__":
    main()
