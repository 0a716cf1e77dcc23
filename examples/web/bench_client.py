"""Throughput benchmark client for the web demo's /detect endpoint.

Measures the served detection rate the way the reference measures its
realtime WASM surface (README.md:214 claims ~60 FPS for 640x480 frames at
MinSize 200): encode a 640x480 frame as JPEG once, then POST it repeatedly
with `--concurrency` requests in flight (matching the browser page's
pipelined fetch loop) and report end-to-end frames/sec.

    # in one shell:
    python examples/web/main.py --engine tpu-stream --source x.jpg \
        --min-size 200 --max-size 480 --shift 0.1 --scale 1.1
    # in another:
    python examples/web/bench_client.py --frames 200 --concurrency 3
"""

from __future__ import annotations

import argparse
import io
import sys
import threading
import time
import urllib.request


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default="http://localhost:5000/detect")
    p.add_argument("--image", default="assets/testdata/sample.jpg")
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--concurrency", type=int, default=3)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    img = Image.open(args.image).convert("RGB").resize((640, 480))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=70)
    payload = buf.getvalue()

    def post():
        req = urllib.request.Request(args.url, data=payload, method="POST")
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            return resp.read()

    first = post()  # warm up / compile
    print(f"first response: {first[:120].decode()}", file=sys.stderr)

    n_done = 0
    lock = threading.Lock()

    def worker(budget):
        nonlocal n_done
        for _ in range(budget):
            post()
            with lock:
                n_done += 1

    t0 = time.perf_counter()
    per = args.frames // args.concurrency
    threads = [threading.Thread(target=worker, args=(per,))
               for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    print(f"{n_done} frames in {dt:.2f}s -> {n_done / dt:.1f} fps "
          f"(concurrency {args.concurrency}, 640x480)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
