"""Host input-pipeline benchmark: PIL vs native vs native_fused decoders on
photo-sized JPEGs (the host decode rate bounds real-data training, not the
TPU — train_step is ~3.8 ms while a 64-image gather takes 130-500 ms)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nwhead_tpu.data import transforms as T
from nwhead_tpu.data.datasets import ImageFileDataset


def main(n=64, hw=(480, 640), workers=(8, 16, 32), source="real"):
    from nwhead_tpu.utils.pipeline import real_photo_jpegs, synth_photo_jpegs

    # Real photographs by default — synthetic block mosaics have flat-run
    # entropy that makes Huffman decode look several times cheaper than on
    # camera images (measured ~7x on this host).
    paths = None
    if source == "real":
        paths = real_photo_jpegs(n, grid=(hw[0] // 16, hw[1] // 16))
    if paths is None:
        paths = synth_photo_jpegs(n, grid=(hw[0] // 16, hw[1] // 16))
        source = "synthetic"
    print(f"jpeg source: {source}", flush=True)
    targets = np.zeros(n, np.int64)

    for dec in ("pil", "native", "native_fused"):
        for w in workers:
            t = T.imagenet_train_transform(seed=0)
            ds = ImageFileDataset(paths, targets, 1, transform=t,
                                  workers=w, decoder=dec)
            ds.gather([0, 1])  # warm pools / build .so
            t0 = time.time()
            reps = 6
            for _ in range(reps):
                ds.gather(np.arange(n))
            dt = (time.time() - t0) / reps
            print(f"{dec:13s} workers={w:3d}: {dt*1000:7.1f} ms/batch{n} "
                  f"({n/dt:,.0f} img/s)", flush=True)


if __name__ == "__main__":
    main(source="synth" if "--synth" in sys.argv[1:] else "real")
