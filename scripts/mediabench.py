"""Media decode throughput evidence (VERDICT r4 item 3).

Times the round-4 per-symbol tree-walk Huffman decoder (extracted from
git history into a side module) against the current 16-bit-prefix LUT
entropy decoder on an identical deterministically-encoded baseline-JPEG
corpus, single-threaded driver-side — the per-image kernel that runs
inside the multimodal ``mapInPandas`` path. The distributed MB/s number
for the same kernel is ``media_decode_mbps`` in BENCH (bench.py
``p_media_decode``: a 64-clip MJPEG-in-AVI corpus through
``multimodal.extract_features(decode_stub=False)``).

    git show <r4-rev>:searchengine_spark/pipeline/jpeg.py > /tmp/jpeg_r4.py
    python scripts/mediabench.py            # writes MEDIABENCH.json

Decoded pixels are asserted identical between the two decoders before
timing.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OLD_PATH = os.environ.get("MEDIABENCH_OLD", "/tmp/jpeg_r4.py")
OUT = os.path.join(REPO, os.environ.get("MEDIABENCH_OUT", "MEDIABENCH.json"))


def main() -> None:
    from searchengine_spark.pipeline import jpeg as new_jpeg

    spec = importlib.util.spec_from_file_location("jpeg_r4", OLD_PATH)
    old_jpeg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_jpeg)

    xx, yy = np.meshgrid(np.arange(320), np.arange(240))
    payloads = []
    for i in range(24):
        rng = np.random.default_rng(500 + i)
        img = np.stack(
            [(xx * 2 + 7 * i) % 256, (yy * 3 + i) % 256, (xx + yy + i) % 256],
            axis=-1,
        )
        img = (
            (img.astype(int) + rng.integers(-24, 25, size=img.shape))
            .clip(0, 255)
            .astype(np.uint8)
        )
        payloads.append(new_jpeg.encode_jpeg(img, quality=85, subsample=True))
    total_mb = sum(map(len, payloads)) / 1e6

    for p in payloads[:3]:
        a, b = old_jpeg.decode_jpeg(p), new_jpeg.decode_jpeg(p)
        assert a[0] == b[0] and a[1] == b[1] and (a[2] == b[2]).all()

    def bench(mod) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            for p in payloads:
                mod.decode_jpeg(p)
            best = min(best, time.time() - t0)
        return best

    t_old, t_new = bench(old_jpeg), bench(new_jpeg)
    res = {
        "corpus_mb": round(total_mb, 2),
        "n_images": len(payloads),
        "image_px": "320x240 4:2:0 q85",
        "r4_treewalk_sec": round(t_old, 3),
        "r5_lut_sec": round(t_new, 3),
        "speedup": round(t_old / t_new, 2),
        "r4_mbps": round(total_mb / t_old, 3),
        "r5_mbps": round(total_mb / t_new, 3),
        "note": (
            "single-threaded per-image kernel; the distributed number for "
            "the same kernel is BENCH's media_decode_mbps (mapInPandas over "
            "an MJPEG corpus). Still Python per symbol — a native codec "
            "swaps in at the multimodal.py plug with schema/batching "
            "unchanged."
        ),
    }
    print(json.dumps(res, indent=2))
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
