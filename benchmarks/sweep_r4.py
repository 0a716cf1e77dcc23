"""Round-4 TPU measurement sweep (VERDICT r3 items 1,3,4,5) (run on the real chip, ONE job at a time).

Measures, printing one line per config:
  1. headline face-only stream (320x400)        x MXU_READ {0,1}
  2. host-free mode (NO_NATIVE=1)               x MXU_READ {0,1}
  3. rotated 45-deg stream                      x MXU_READ {0,1}
  4. 1080p stream (min 40)                      x MXU_READ {0,1}
  5. full pipeline detect_stream_device          x INT8 {0,1}
  6. web640 config full pipeline                 x INT8 {0,1}

Usage: python /tmp/measure_r3.py [section ...]   (default: all)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

SECTIONS = set(sys.argv[1:]) or {"headline", "hostfree", "rot", "hd",
                                 "pipe", "web", "crowd", "rotpipe"}


def stream_ms(fc, frames, depth=8, **cfg):
    import itertools
    warm = list(fc.stream_hits(frames[:2], depth=2, **cfg))
    t0 = time.perf_counter()
    outs = list(fc.stream_hits(frames, depth=depth, **cfg))
    dt = (time.perf_counter() - t0) / len(frames)
    return dt, outs


def main():
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.models.face import FaceCascade

    img = get_image("/root/repo/assets/testdata/sample.jpg")
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    cfg = dict(min_size=20, max_size=1000, shift_factor=0.1,
               scale_factor=1.1)
    frames = [np.roll(gray, i % 8, axis=1) for i in range(64)]

    def face_variants(tag, frames, angle=0.0, depth=8, **cfg):
        for mxu in ("0", "1"):
            os.environ["PIGO_TPU_MXU_READ"] = mxu
            fc = FaceCascade()
            dt, outs = stream_ms(fc, frames, depth=depth, angle=angle, **cfg)
            n = outs[0].shape[0]
            print(f"{tag} mxu={mxu}: {dt*1e3:.2f} ms/frame "
                  f"({1/dt:.1f} fps), {n} dets", flush=True)

    if "headline" in SECTIONS:
        face_variants("headline", frames, **cfg)

    if "hostfree" in SECTIONS:
        os.environ["PIGO_TPU_NO_NATIVE"] = "1"
        face_variants("hostfree", frames, **cfg)
        del os.environ["PIGO_TPU_NO_NATIVE"]

    if "rot" in SECTIONS:
        face_variants("rot45", frames, angle=0.125, **cfg)

    if "hd" in SECTIONS:
        reps = (1080 // rows + 1, 1920 // cols + 1)
        hd = np.tile(gray, reps)[:1080, :1920]
        hdf = [np.roll(hd, i % 8, axis=1) for i in range(24)]
        face_variants("1080p", hdf, depth=6, min_size=40, max_size=1080,
                      shift_factor=0.1, scale_factor=1.1)

    def pipe_variants(tag, frame, params, n=48, depth=4, angle=0.0):
        from pigo_tpu.detector import FaceDetector
        pf = [np.roll(frame, i % 7, axis=1) for i in range(n)]
        for i8 in ("0", "1"):
            os.environ["PIGO_TPU_POST_INT8"] = i8
            det = FaceDetector()
            list(det.detect_stream_device(iter(pf[:2]), params, angle,
                                          depth=1))
            t0 = time.perf_counter()
            outs = list(det.detect_stream_device(iter(pf), params, angle,
                                                 depth=depth))
            dt = (time.perf_counter() - t0) / n
            r0 = outs[0]
            print(f"{tag} int8={i8}: {dt*1e3:.2f} ms/frame ({1/dt:.1f} fps),"
                  f" faces={len(r0)} eyes={len(r0[0].eyes) if r0 else 0}"
                  f" lmk={len(r0[0].landmarks) if r0 else 0}", flush=True)

    if "pipe" in SECTIONS:
        from pigo_tpu.detector import CascadeParams
        pipe_variants("pipeline", gray,
                      CascadeParams(min_size=20, max_size=1000,
                                    shift_factor=0.1, scale_factor=1.1))

    if "rotpipe" in SECTIONS:
        from pigo_tpu.detector import CascadeParams
        pipe_variants("rotpipe45", gray,
                      CascadeParams(min_size=20, max_size=1000,
                                    shift_factor=0.1, scale_factor=1.1),
                      angle=0.125)

    if "crowd" in SECTIONS:
        # >= 8 faces: 2x4 tiling of the downscaled portrait (VERDICT #8 —
        # measure the escalation ladder's steady state under load)
        from PIL import Image
        from pigo_tpu.detector import CascadeParams
        small = np.asarray(
            Image.fromarray(gray).resize((cols // 2, rows // 2)), np.uint8)
        crowd = np.tile(small, (2, 4))
        pipe_variants("crowd8", crowd,
                      CascadeParams(min_size=40, max_size=300,
                                    shift_factor=0.1, scale_factor=1.1),
                      n=48, depth=4)

    if "web" in SECTIONS:
        from PIL import Image
        from pigo_tpu.detector import CascadeParams
        big = np.asarray(
            Image.fromarray(gray).resize((640, 480)), np.uint8)
        # reference WASM config: wasm/detector/detector.go:156-161
        pipe_variants("web640", big,
                      CascadeParams(min_size=200, max_size=480,
                                    shift_factor=0.1, scale_factor=1.1),
                      n=96, depth=4)


if __name__ == "__main__":
    main()
